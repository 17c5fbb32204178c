"""Stateful STREAMING sessionization with watermark semantics.

The one operator class in this repo that the Dataset API genuinely cannot
express (the documented escape hatch): session state must persist ACROSS
micro-batches of an ordered, unbounded stream, and results must be emitted
BEFORE end-of-stream as the watermark passes. ``map_batches`` actors see
one batch at a time with no cross-batch key routing; ``groupby`` needs the
whole input. So this stage is raw keyed Ray actors — 64 ``SessionShard``
actors each own ``hash(user) & 63``'s open-session state, the driver plays
the role of the source (re-playing the events table in timestamp order as
micro-batches; in production this is the log tail), and every shard closes
sessions eagerly on gap-expiry plus on watermark advance.

Correctness contract: after the final flush, (user, n_sessions,
max_session_events) is EXACTLY the batch gap-sessionization —
``relational.EVENTS_SESSIONS_SQL`` is the oracle, and the mid-stream
watermark emissions are pinned by tests to never duplicate or drop a
session. Partitioning assumption (documented per the custom-operator
rule): one actor owns ALL events of its users, and the source feeds each
actor in global timestamp order (Ray actor calls from one driver preserve
submission order per actor).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

from data_quality_ray.pipelines.relational import _pq, ts_us

N_STREAM_SHARDS = 8


@ray.remote(num_cpus=0.25)
class SessionShard:
    """Owns open-session state for one hash shard of users.

    State per user: (last_ts_us, n_events_in_open_session). Closed
    sessions accumulate as (user, n_events) pairs and are drained by
    ``take_closed`` (watermark emission) or ``flush`` (end of stream)."""

    def __init__(self, gap_us: int):
        self.gap = int(gap_us)
        self.last: dict[int, int] = {}
        self.count: dict[int, int] = {}
        self.closed_users: list[int] = []
        self.closed_n: list[int] = []

    def ingest(self, users: np.ndarray, ts: np.ndarray) -> int:
        """Fold one ts-ordered micro-batch slice. Per-user work is one
        boundary check against stored state plus vectorized in-batch
        session splits — per (batch, user), never per event."""
        order = np.lexsort((ts, users))
        u, t = users[order], ts[order]
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        ends = np.r_[starts[1:], len(u)]
        for s, e in zip(starts, ends):
            uid = int(u[s])
            tt = t[s:e]
            brk = np.flatnonzero(np.diff(tt) > self.gap)  # in-batch splits
            seg_starts = np.r_[0, brk + 1]
            seg_ends = np.r_[brk + 1, len(tt)]
            sizes = (seg_ends - seg_starts).tolist()
            if uid in self.last and tt[0] - self.last[uid] <= self.gap:
                sizes[0] += self.count[uid]  # continues the open session
            elif uid in self.last:
                self.closed_users.append(uid)  # gap expired across batches
                self.closed_n.append(self.count[uid])
            for n in sizes[:-1]:
                self.closed_users.append(uid)
                self.closed_n.append(int(n))
            self.last[uid] = int(tt[-1])
            self.count[uid] = int(sizes[-1])
        return len(users)

    def advance_watermark(self, wm_us: int) -> "pd.DataFrame":
        """Close every open session whose user cannot receive another
        in-gap event (last < wm − gap) and emit all closed sessions so
        far — the streaming property: output BEFORE end-of-stream."""
        expired = [uid for uid, lt in self.last.items() if lt < wm_us - self.gap]
        for uid in expired:
            self.closed_users.append(uid)
            self.closed_n.append(self.count[uid])
            del self.last[uid]
            del self.count[uid]
        return self._drain()

    def flush(self) -> "pd.DataFrame":
        for uid in sorted(self.last):
            self.closed_users.append(uid)
            self.closed_n.append(self.count[uid])
        self.last.clear()
        self.count.clear()
        return self._drain()

    def _drain(self) -> "pd.DataFrame":
        out = pd.DataFrame(
            {
                "user_id": np.asarray(self.closed_users, dtype=np.int64),
                "n_events": np.asarray(self.closed_n, dtype=np.int64),
            }
        )
        self.closed_users, self.closed_n = [], []
        return out


def streaming_sessions(
    sf_dir: str,
    gap_minutes: int = 30,
    batch_rows: int = 4096,
    n_shards: int = N_STREAM_SHARDS,
    watermark_every: int = 4,
) -> pd.DataFrame:
    """Replay the events table as a ts-ordered stream through keyed
    session-shard actors; return per-user (n_sessions,
    max_session_events) — value-identical to the batch sessionization
    (``relational.events_sessions`` / EVENTS_SESSIONS_SQL).

    The ``ds.sort("ts")`` is the stream-order guarantee a real source
    provides; ``watermark_every`` micro-batches, every shard closes
    expired sessions and emits them (collected incrementally, so driver
    state is emitted-sessions-bounded, not stream-bounded)."""
    gap_us = gap_minutes * 60_000_000

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({"user_id": t["user_id"], "ts_us": ts_us(t["ts"])})

    stream = (
        rd.read_parquet(_pq(sf_dir, "events"), columns=["user_id", "ts"])
        .map_batches(prep, batch_format="pyarrow")
        .sort("ts_us")
    )
    shards = [SessionShard.remote(gap_us) for _ in range(n_shards)]
    emitted: list[pd.DataFrame] = []
    pending: list = []
    i = 0
    wm = None
    for batch in stream.iter_batches(batch_size=batch_rows, batch_format="pyarrow"):
        users = batch["user_id"].to_numpy()
        ts = batch["ts_us"].to_numpy()
        pk = (users % n_shards).astype(np.int64)
        for s in range(n_shards):
            m = pk == s
            if m.any():
                pending.append(shards[s].ingest.remote(users[m], ts[m]))
        wm = int(ts[-1])
        i += 1
        if i % watermark_every == 0:
            ray.get(pending)  # all ingests ordered before the watermark
            pending = []
            emitted.extend(ray.get([s.advance_watermark.remote(wm) for s in shards]))
    ray.get(pending)
    emitted.extend(ray.get([s.flush.remote() for s in shards]))

    closed = pd.concat(emitted, ignore_index=True)
    if len(closed) == 0:
        return pd.DataFrame(
            {"user_id": [], "n_sessions": [], "max_session_events": []}
        ).astype("int64")
    out = closed.groupby("user_id", as_index=False).agg(
        n_sessions=("n_events", "size"), max_session_events=("n_events", "max")
    )
    out = out.astype(
        {"user_id": "int64", "n_sessions": "int64", "max_session_events": "int64"}
    )
    return out.sort_values("user_id").reset_index(drop=True)
