"""Stateful streaming sessionization: watermark semantics, cross-batch
state, and exact convergence to the batch oracle."""

import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def _ray(ray_session):
    return ray_session


def test_streaming_matches_batch_and_oracle(_ray):
    """After the final flush the streaming result must be value-identical
    to batch gap-sessionization AND the SQL oracle."""
    import duckdb

    from data_quality_ray.pipelines import relational
    from data_quality_ray.pipelines.streaming import streaming_sessions

    got = streaming_sessions(SF_DIR, batch_rows=128, watermark_every=2)
    batch = relational.events_sessions(SF_DIR)
    assert got.equals(batch)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF_DIR}/events.parquet')"
    )
    exp = con.execute(relational.EVENTS_SESSIONS_SQL).df()
    for c in got.columns:
        assert np.array_equal(
            got[c].to_numpy().astype("int64"), exp[c].to_numpy().astype("int64")
        ), c


def test_streaming_tiny_batches_cross_boundary_state(_ray):
    """batch_rows=7 forces nearly every session to straddle micro-batch
    boundaries and watermark_every=1 fires the eager close path each
    batch — the result must still be exact."""
    from data_quality_ray.pipelines import relational
    from data_quality_ray.pipelines.streaming import streaming_sessions

    got = streaming_sessions(SF_DIR, batch_rows=7, watermark_every=1)
    assert got.equals(relational.events_sessions(SF_DIR))


def test_streaming_emits_before_end_of_stream(_ray):
    """The watermark must close and EMIT expired sessions mid-stream: a
    shard fed two bursts a day apart emits the first burst's session on
    the watermark advance, before any flush."""
    import ray as _ray_mod

    from data_quality_ray.pipelines.streaming import SessionShard

    gap_us = 30 * 60_000_000
    shard = SessionShard.remote(gap_us)
    day = 86_400_000_000
    u = np.array([5, 5, 5], dtype=np.int64)
    t0 = np.array([0, 1_000_000, 2_000_000], dtype=np.int64)
    _ray_mod.get(shard.ingest.remote(u, t0))
    early = _ray_mod.get(shard.advance_watermark.remote(day))
    assert len(early) == 1 and int(early["n_events"].iloc[0]) == 3
    # a later burst starts a NEW session; the early emission is not re-sent
    _ray_mod.get(shard.ingest.remote(u[:2], t0[:2] + day))
    final = _ray_mod.get(shard.flush.remote())
    assert len(final) == 1 and int(final["n_events"].iloc[0]) == 2
