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


def test_hll_sketch_accuracy_and_merge(_ray):
    """HLL distinct estimates per event type within 5% of exact; register
    merge associativity: one-shot == two-half merge."""
    import numpy as np

    from data_quality_ray.functions import sketches as sk
    from data_quality_ray.pipelines import relational_ext as rx

    approx = rx.events_user_hll(SF_DIR).set_index("event_type")["n_users_approx"]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF_DIR}/events.parquet')"
    )
    exact = con.execute(
        "SELECT event_type, count(DISTINCT user_id) AS n FROM events GROUP BY 1"
    ).df().set_index("event_type")["n"]
    for etype, n in exact.items():
        err = abs(approx[etype] - n) / max(n, 1)
        assert err < 0.05, f"{etype}: approx {approx[etype]} vs exact {n} ({err:.1%})"

    vals = np.arange(10_000, dtype=np.int64)
    one = sk.hll_accumulate(sk.hll_empty(), vals)
    half = sk.hll_merge(
        sk.hll_accumulate(sk.hll_empty(), vals[:5000]),
        sk.hll_accumulate(sk.hll_empty(), vals[5000:]),
    )
    assert np.array_equal(one, half)
    assert abs(sk.hll_estimate(one) - 10_000) / 10_000 < 0.05


def test_cms_heavy_hitters_vs_exact(_ray):
    """CMS top terms: point estimates never undercount, and the sketch
    recovers most of the exact top-k."""
    from data_quality_ray.pipelines import documents

    exact = documents.doc_top_terms(SF_DIR, k=25)
    approx = documents.doc_top_terms_cms(SF_DIR, k=25)
    ex = dict(zip(exact["token"], exact["n"]))
    ap = dict(zip(approx["token"], approx["n_est"]))
    hits = set(ex) & set(ap)
    assert len(hits) >= 20, f"CMS recovered only {len(hits)}/25 exact top terms"
    for tok in hits:
        assert ap[tok] >= ex[tok], f"CMS undercounted {tok!r}"  # structural property
        assert ap[tok] <= ex[tok] * 1.5 + 50, f"CMS overcount too large for {tok!r}"


def test_median_distributed_path_matches_ingroup_and_oracle(_ray):
    """The histogram-refine exact median (forced) must equal the in-group
    selection path bit-for-bit AND the SQL oracle."""
    import numpy as np

    from data_quality_ray.pipelines import relational_ext as rx

    a = rx.events_value_median(SF_DIR)
    b = rx.events_value_median(SF_DIR, force_distributed=True)
    assert np.array_equal(
        a["median_value"].to_numpy().view("int64"),
        b["median_value"].to_numpy().view("int64"),
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF_DIR}/events.parquet')"
    )
    exp = con.execute(rx.EVENTS_VALUE_MEDIAN_SQL).df()
    assert np.array_equal(
        b["median_value"].to_numpy().view("int64"),
        exp["median_value"].to_numpy().view("int64"),
    )


def test_events_anomaly_flags_planted_outlier(ray_session, tmp_path):
    """The testdata's uniform values can never exceed 3sigma (bounded
    support), so the sf oracle check only exercises the all-false branch;
    this plants a genuine spike and checks BOTH branches vs DuckDB."""
    import duckdb
    import numpy as np
    import pandas as pd

    from data_quality_ray.pipelines.relational_ext import (
        EVENTS_ANOMALY_FLAGS_SQL, events_anomaly_flags,
    )

    n = 40
    ts = pd.Timestamp("2024-01-01") + pd.to_timedelta(np.arange(n) * 30, unit="s")
    vals = np.full(n, 10.00)
    vals[25] = 500.00  # the spike, well past 3 sigma of its trailing hour
    df = pd.DataFrame(
        {"event_id": np.arange(n, dtype=np.int64), "ts": ts,
         "user_id": np.int64(7), "event_type": "view", "value": vals,
         "props": "{}"}
    )
    sf = tmp_path / "anom"
    sf.mkdir()
    df.to_parquet(sf / "events.parquet")

    got = events_anomaly_flags(str(sf))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')")
    want = con.execute(EVENTS_ANOMALY_FLAGS_SQL).df()
    assert got["is_anomaly"].to_numpy().astype(bool).tolist() == want[
        "is_anomaly"
    ].to_numpy().astype(bool).tolist()
    assert bool(got.loc[got["event_id"] == 25, "is_anomaly"].iloc[0]) is True
    assert int(got["is_anomaly"].sum()) >= 1
    assert not got.loc[got["event_id"] < 25, "is_anomaly"].any()


def test_mad_distributed_path_matches_ingroup_and_oracle(_ray):
    """events_value_mad's TWO-round histogram-refine path (forced) must
    equal the in-group selection path bit-for-bit AND DuckDB mad()."""
    import numpy as np

    from data_quality_ray.pipelines import relational_ext as rx

    a = rx.events_value_mad(SF_DIR)
    b = rx.events_value_mad(SF_DIR, force_distributed=True)
    assert np.array_equal(
        a["mad_value"].to_numpy().view("int64"),
        b["mad_value"].to_numpy().view("int64"),
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF_DIR}/events.parquet')"
    )
    exp = con.execute(rx.EVENTS_VALUE_MAD_SQL).df()
    assert np.array_equal(
        b["mad_value"].to_numpy().view("int64"),
        exp["mad_value"].to_numpy().view("int64"),
    )


def test_window_join_boundary_semantics(ray_session, tmp_path):
    """Planted boundary rows pin the interval's half-open semantics: an
    event AT the orderdate is excluded (strict >), one exactly 7 days
    later is included (<=), one 7 days + 1 µs later is excluded — and a
    user with zero events emits zeros (LEFT join)."""
    import numpy as np
    import pandas as pd

    from data_quality_ray.pipelines import relational_ext as rx

    sf = tmp_path / "sf"
    sf.mkdir()
    t0 = pd.Timestamp("1995-06-01")
    week = pd.Timedelta(days=7)
    us = pd.Timedelta(microseconds=1)
    orders = pd.DataFrame(
        {
            "o_orderkey": [1, 2],
            "o_custkey": [10, 20],
            "o_orderdate": [t0, t0],
        }
    )
    events = pd.DataFrame(
        {
            "user_id": [10, 10, 10, 10],
            "ts": [t0, t0 + us, t0 + week, t0 + week + us],
            "value": [1.0, 2.0, 4.0, 8.0],
            "event_id": [1, 2, 3, 4],
            "event_type": ["a"] * 4,
            "props": ["{}"] * 4,
        }
    )
    orders.to_parquet(sf / "orders.parquet", index=False)
    events.to_parquet(sf / "events.parquet", index=False)

    out = rx.orders_events_window_join(str(sf))
    got = out.set_index("o_orderkey")
    # order 1 (user 10): excludes the t0 event and the t0+7d+1µs event
    assert int(got.loc[1, "n_events"]) == 2
    assert int(got.loc[1, "value_e6_sum"]) == 6_000_000
    # order 2 (user 20): no events at all → LEFT-join zeros
    assert int(got.loc[2, "n_events"]) == 0
    assert int(got.loc[2, "value_e6_sum"]) == 0

    import duckdb

    con = duckdb.connect()
    for t in ("events", "orders"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    exp = con.execute(rx.ORDERS_EVENTS_WINDOW_JOIN_SQL).df()
    assert np.array_equal(out["n_events"].to_numpy(), exp["n_events"].to_numpy())
    assert np.array_equal(
        out["value_e6_sum"].to_numpy(), exp["value_e6_sum"].to_numpy()
    )


def test_type_transitions_user_boundary(ray_session, tmp_path):
    """Adjacent rows of DIFFERENT users must not emit a transition; order
    within a user follows (ts, event_id)."""
    import pandas as pd

    from data_quality_ray.pipelines import relational_ext as rx

    sf = tmp_path / "sf"
    sf.mkdir()
    t0 = pd.Timestamp("2024-01-01")
    s = pd.Timedelta(seconds=1)
    events = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 2, 2],
            "ts": [t0, t0 + s, t0 + s, t0 + 2 * s, t0 + 3 * s],
            "event_id": [1, 3, 2, 4, 5],
            "event_type": ["a", "c", "b", "x", "y"],
            "value": [0.0] * 5,
            "props": ["{}"] * 5,
        }
    )
    events.to_parquet(sf / "events.parquet", index=False)
    out = rx.events_type_transitions(str(sf))
    got = {(r.prev_type, r.next_type): r.n for r in out.itertuples()}
    # user 1: a→b (event_id tie-break puts 2 before 3), b→c; user 2: x→y
    assert got == {("a", "b"): 1, ("b", "c"): 1, ("x", "y"): 1}


def test_quantile_sketch_error_bound_and_determinism(_ray):
    """The DDSketch quantile aggregate must sit within its α relative-error
    guarantee of the exact lower-rank quantile per event type, and be
    bit-identical across runs (bucket-count merge is associative)."""
    import numpy as np
    import pandas as pd

    from data_quality_ray.functions import sketches as sk
    from data_quality_ray.pipelines import relational_ext as rx

    a = rx.events_value_quantile_sketch(SF_DIR)
    b = rx.events_value_quantile_sketch(SF_DIR)
    assert a.equals(b), "sketch aggregate not deterministic"

    ev = pd.read_parquet(f"{SF_DIR}/events.parquet", columns=["event_type", "value"])
    for _, row in a.iterrows():
        v = np.sort(ev[ev["event_type"] == row["event_type"]]["value"].to_numpy())
        for q, col in ((0.50, "p50"), (0.95, "p95"), (0.99, "p99")):
            exact = v[int(np.floor(q * (len(v) - 1)))]
            rel = abs(row[col] - exact) / max(abs(exact), 1e-12)
            assert rel <= sk.DD_ALPHA + 1e-9, (row["event_type"], col, rel)


def test_doc_shuffle_shards_param_sync_and_contiguity(_ray):
    """Non-default n_shards must stay in lockstep with its GENERATED oracle
    (the parameterized-query invariant), and within-shard positions must be
    a contiguous 0..n-1 run (the property shard consumers rely on)."""
    import numpy as np

    from data_quality_ray.pipelines import documents as D

    out = D.doc_shuffle_shards(SF_DIR, n_shards=4)
    assert set(out["shard"].unique()) <= set(range(4))
    for _, g in out.groupby("shard"):
        assert np.array_equal(np.sort(g["pos"].to_numpy()), np.arange(len(g)))

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF_DIR}/documents.parquet')"
    )
    exp = con.execute(D.doc_shuffle_shards_sql(4)).df()
    for c in ("doc_id", "shard", "pos"):
        assert np.array_equal(
            out[c].to_numpy().astype("int64"), exp[c].to_numpy().astype("int64")
        ), c
