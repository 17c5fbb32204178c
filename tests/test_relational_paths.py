"""Size-gated join paths: both executions must be value-identical."""

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def _ray(ray_session):
    return ray_session


def test_asof_partitioned_matches_broadcast_and_oracle(_ray):
    """The co-partitioned merge_asof path (forced) must agree row-for-row
    with the broadcast searchsorted path AND the SQL oracle — the hash-green
    guarantee holds through the size gate."""
    from data_quality_ray.pipelines import relational

    broad = relational.events_asof_orders(SF_DIR)
    part = relational.events_asof_orders(SF_DIR, force_partitioned=True)
    assert part.equals(broad)

    con = duckdb.connect()
    for t in ("events", "orders"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    oracle = con.execute(relational.EVENTS_ASOF_ORDERS_SQL).df()
    assert part.reset_index(drop=True).astype("int64").equals(
        oracle.reset_index(drop=True).astype("int64")
    )
