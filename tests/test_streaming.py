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


def test_streaming_source_is_distributed_and_sort_free(_ray):
    """Round-5 scale contract: (1) the log build runs with NO all-to-all
    operator (map-only plan — the round-4 global sort is gone); (2) every
    shard emits sessions mid-stream via its own watermark; (3) only
    user-grain rows reach the driver — bytes through the driver are
    O(|result|), not O(|stream|)."""
    import pyarrow.parquet as pq

    from data_quality_ray.pipelines.streaming import streaming_sessions

    got, shard_stats, plan = streaming_sessions(
        SF_DIR, batch_rows=64, watermark_every=2, return_stats=True
    )
    assert "AllToAll" not in plan and "Sort" not in plan and "Aggregate" not in plan

    n_events = pq.read_metadata(f"{SF_DIR}/events.parquet").num_rows
    assert sum(s["rows_streamed"] for s in shard_stats) == n_events
    # event-grain data never crosses the driver: each worker returns only
    # its per-user aggregate, and those rows sum to the final result
    assert sum(s["result_rows"] for s in shard_stats) == len(got)
    assert all(s["result_rows"] < s["rows_streamed"] for s in shard_stats)
    # the streaming property: sessions were emitted BEFORE end-of-stream
    assert sum(s["emitted_before_flush"] for s in shard_stats) > 0
    assert sum(s["n_watermark_drains"] for s in shard_stats) > 0


def test_streaming_merge_handles_interleaved_segments(_ray):
    """The per-shard k-way run merge must produce a ts-ordered feed even
    when segment ts ranges fully interleave (the events parquet is mostly
    ts-clustered, so this exercises the merge path synthetic-only)."""
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray as _ray_mod

    from data_quality_ray.pipelines import relational
    from data_quality_ray.pipelines.streaming import ShardWorker

    rng = np.random.default_rng(7)
    users = rng.integers(0, 10, size=600).astype(np.int64) * 8  # all shard 0
    ts = np.sort(rng.integers(0, 86_400_000_000, size=600).astype(np.int64))
    d = tempfile.mkdtemp(prefix="merge_test_")
    try:
        # 5 segments taking strided (fully interleaved) slices, each sorted
        paths = []
        for i in range(5):
            idx = np.arange(i, 600, 5)
            seg = pa.table(
                {"user_id": users[idx], "ts_us": ts[idx]}
            ).sort_by("ts_us")
            p = os.path.join(d, f"seg-{i}.parquet")
            pq.write_table(seg, p)
            paths.append(p)
        gap_us = 30 * 60_000_000
        w = ShardWorker.remote(0, paths, gap_us, 50, 2)
        out, stats = _ray_mod.get(w.run.remote())
        _ray_mod.kill(w)
        # oracle: single-pass gap sessionization over the globally sorted rows
        df = (
            pd.DataFrame({"user_id": users, "ts_us": ts})
            .sort_values(["user_id", "ts_us"], kind="mergesort")
            .reset_index(drop=True)
        )
        new_sess = (
            df.groupby("user_id")["ts_us"].diff().fillna(gap_us + 1) > gap_us
        )
        df["sess"] = new_sess.cumsum()
        sess = df.groupby(["user_id", "sess"]).size().rename("n").reset_index()
        exp = sess.groupby("user_id", as_index=False).agg(
            n_sessions=("n", "size"), max_session_events=("n", "max")
        ).astype("int64")
        assert out.reset_index(drop=True).equals(exp.reset_index(drop=True))
        assert stats["merge_runs"] > 5  # interleaving forced multi-run merge
    finally:
        import shutil

        shutil.rmtree(d, ignore_errors=True)


def test_streaming_hourly_windows_match_batch_and_oracle(_ray):
    """The streaming tumbling-window aggregate must converge EXACTLY to
    the batch events_hourly / its SQL oracle, emit completed windows
    mid-stream, and keep the log build all-to-all-free."""
    import duckdb

    from data_quality_ray.pipelines import relational
    from data_quality_ray.pipelines.streaming import streaming_hourly_windows

    got, stats, plan = streaming_hourly_windows(
        SF_DIR, batch_rows=128, watermark_every=2, return_stats=True
    )
    assert got.equals(relational.events_hourly(SF_DIR))
    assert "AllToAll" not in plan and "Sort" not in plan

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF_DIR}/events.parquet')"
    )
    exp = con.execute(relational.EVENTS_HOURLY_SQL).df()
    assert np.array_equal(got["n_events"].to_numpy(), exp["n_events"].to_numpy())
    assert np.array_equal(got["value_sum"].to_numpy(), exp["value_sum"].to_numpy())
    assert got["event_type"].tolist() == exp["event_type"].tolist()

    # streaming properties: windows left the workers BEFORE the flush, and
    # worker state is window-grain — peak open windows never exceeds the
    # shard's total window count (watermark drains keep it below)
    assert sum(s["emitted_before_flush"] for s in stats) > 0
    assert all(s["peak_open_windows"] <= s["result_rows"] for s in stats)
    assert sum(s["result_rows"] for s in stats) >= len(got)  # shard partials


def test_streaming_hourly_windows_tiny_batches(_ray):
    """Window state must survive micro-batch boundaries (batch_rows=7,
    watermark every batch) and still converge exactly."""
    from data_quality_ray.pipelines import relational
    from data_quality_ray.pipelines.streaming import streaming_hourly_windows

    got = streaming_hourly_windows(SF_DIR, batch_rows=7, watermark_every=1)
    assert got.equals(relational.events_hourly(SF_DIR))


def test_streaming_sessions_resumable_partitions(_ray, tmp_path):
    """The streaming sink must write one atomic parquet partition per
    shard and a re-run must skip committed shards — delete one partition
    and ONLY that shard replays; the final result is identical either way
    (the checkpointed-pipeline contract on the streaming family)."""
    import os

    from data_quality_ray.pipelines import relational
    from data_quality_ray.pipelines.streaming import N_STREAM_SHARDS, streaming_sessions

    out_dir = str(tmp_path / "sessions_out")
    base = relational.events_sessions(SF_DIR)

    got = streaming_sessions(SF_DIR, batch_rows=128, out_dir=out_dir)
    assert got.equals(base)
    files = sorted(os.listdir(out_dir))
    assert files == ["_meta.json"] + [
        f"shard={s}.parquet" for s in range(N_STREAM_SHARDS)
    ]

    # fully committed: re-run replays NOTHING (no log build, no workers)
    got2, stats2, plan2 = streaming_sessions(
        SF_DIR, batch_rows=128, out_dir=out_dir, return_stats=True
    )
    assert got2.equals(base)
    assert all(s.get("resumed") for s in stats2)
    assert sum(s["rows_streamed"] for s in stats2) == 0
    assert "resumed" in plan2

    # partial crash: one partition lost → only that shard replays
    os.unlink(os.path.join(out_dir, "shard=3.parquet"))
    got3, stats3, _ = streaming_sessions(
        SF_DIR, batch_rows=128, out_dir=out_dir, return_stats=True
    )
    assert got3.equals(base)
    replayed = [s["shard"] for s in stats3 if not s.get("resumed")]
    assert replayed == [3]
    assert all(s["rows_streamed"] == 0 for s in stats3 if s.get("resumed"))


def test_streaming_resume_rejects_parameter_mismatch(_ray, tmp_path):
    """Committed partitions are only valid for the parameters that
    produced them: a re-run with a different gap or shard count must fail
    loudly, never silently resume stale output."""
    from data_quality_ray.pipelines.streaming import streaming_sessions

    out_dir = str(tmp_path / "sess_meta")
    streaming_sessions(SF_DIR, gap_minutes=30, out_dir=out_dir)
    with pytest.raises(ValueError, match="fresh out_dir"):
        streaming_sessions(SF_DIR, gap_minutes=60, out_dir=out_dir)
    with pytest.raises(ValueError, match="fresh out_dir"):
        streaming_sessions(SF_DIR, n_shards=16, out_dir=out_dir)
