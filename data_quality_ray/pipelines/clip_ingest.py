"""Incremental AUDIO-corpus ingest: admit new clips only if their CONTENT
is not already in the corpus — the audio twin of pipelines/ingest.py.

Text ingest can key on an exact md5 fingerprint; audio cannot (the same
recording arrives re-encoded, gain-adjusted, or padded with silence), so
membership here is decided by the constellation-fingerprint vote
(stages/fingerprint.py): a new clip is a duplicate of a stored one when
enough landmark hashes agree on a single alignment offset — the same
evidence `clip_fingerprint_matches` uses (shared kernel
``multimodal_dedup.landmark_match_pairs`` and shared calibration
constants FP_MIN_VOTES / FP_MAX_HASH_GROUP), run against a STORED,
append-only landmark index instead of a sibling batch.

Index layout (append-only, identical commit discipline to ingest.py —
one atomic directory rename per batch, staging under .tmp-*):

    index_dir/
      deltas/<batch_id>/
        summary.json              batch outcome (idempotence key)
        bucket=NN/*.parquet       accepted clips' (hash, t, clip) landmarks

Landmark rows are hash-bucketed (``hash % N_CLIP_BUCKETS``) so an ingest
reads only the buckets its batch touches. No Bloom sidecars here,
deliberately: a single accepted clip contributes ~2k landmark hashes, so
a few hundred clips saturate an 8 KB filter into always-hit — the
effective prune for content ingest is bucket partitioning plus the fact
that index rows are ~20 B landmarks, never payloads. Admit decisions:

  - ``rejected_existing``  — aligned votes ≥ FP_MIN_VOTES against a stored
    clip, directly OR transitively (a clip whose only strong match is a
    sibling that itself matched stored content is still stored content —
    the md5 twin is transitive by construction, so this one must be too)
  - ``rejected_in_batch``  — duplicate content within the batch; the
    cluster representative (lowest clip number) is accepted
  - ``accepted``           — everything else; landmarks appended to the index

Vote counting is two hash-partitioned shuffles over landmark rows with
all group work vectorized per partition; only verified match PAIRS reach
the driver, where the stored-hit closure and within-batch union-find
resolve over match-pair-bounded edge sets (the repo-wide driver-CC
contract, pipelines/dedup.py).
"""

from __future__ import annotations

import glob as _glob
import json
import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from data_quality_ray.stages.fingerprint import (
    FP_MAX_HASH_GROUP,
    FP_MIN_VOTES,
    fingerprint_batch,
)

N_CLIP_BUCKETS = 64


def _delta_paths(index_dir: str, buckets: "list[int]") -> "list[str]":
    """Committed landmark files for ONLY the touched buckets (staging
    ``.tmp-*`` dirs live outside deltas/ and never match)."""
    paths: list[str] = []
    for b in buckets:
        paths += _glob.glob(
            os.path.join(index_dir, "deltas", f"*/bucket={b}", "*.parquet")
        )
    return sorted(paths)


def _commit_delta(index_dir: str, batch_id: str, summary: dict, write_fn=None) -> dict:
    """Stage → (optionally) write landmark files → atomic-rename commit.

    The single commit point for every ingest path so crash semantics can
    never diverge: a crash before ``os.replace`` leaves only an invisible
    staging dir; after it, the batch is fully committed (summary included).
    """
    tmp_dir = os.path.join(index_dir, f".tmp-{batch_id}")
    shutil.rmtree(tmp_dir, ignore_errors=True)
    os.makedirs(tmp_dir, exist_ok=True)
    if write_fn is not None:
        write_fn(tmp_dir)
    with open(os.path.join(tmp_dir, "summary.json"), "w") as f:
        json.dump(summary, f)
    os.makedirs(os.path.join(index_dir, "deltas"), exist_ok=True)
    delta_dir = os.path.join(index_dir, "deltas", batch_id)
    shutil.rmtree(delta_dir, ignore_errors=True)  # only ever a crashed partial
    os.replace(tmp_dir, delta_dir)
    return summary


def ingest_new_clips(
    new_clips: "rd.Dataset",
    index_dir: str,
    batch_id: str,
    min_votes: int = FP_MIN_VOTES,
) -> dict:
    """Admit ``new_clips`` (clip_id, bytes, sr_hz, codec) against the stored
    landmark index; returns the batch summary. Idempotent per batch_id."""
    summary_path = os.path.join(index_dir, "deltas", batch_id, "summary.json")
    if os.path.exists(summary_path):
        with open(summary_path) as f:
            return json.load(f)

    fp = new_clips.map_batches(fingerprint_batch, batch_format="pyarrow").materialize()
    # batch grain: driver-safe; unique() is None on a fully-empty dataset
    new_ids = sorted(int(x) for x in (fp.unique("clip") or []))
    if not new_ids:  # nothing decodable/fingerprintable: commit an empty delta
        return _commit_delta(
            index_dir,
            batch_id,
            {
                "batch_id": batch_id,
                "accepted": 0,
                "rejected_existing": 0,
                "rejected_in_batch": 0,
            },
        )

    # touched buckets WITHOUT pulling per-landmark hashes to the driver:
    # distinct-per-block first, then unique over ≤ blocks×64 tiny rows
    buckets = sorted(
        int(b)
        for b in fp.map_batches(
            lambda t: pa.table(
                {"bucket": pc.unique(pc.bit_wise_and(t["hash"], N_CLIP_BUCKETS - 1))}
            ),
            batch_format="pyarrow",
        ).unique("bucket")
    )
    idx_paths = _delta_paths(index_dir, buckets)

    tagged = fp
    if idx_paths:

        def negate(t: pa.Table) -> pa.Table:  # stored ids → −id−1 (sign tag)
            return pa.table(
                {
                    "clip": pc.subtract(pc.negate(t["clip"]), pa.scalar(1, pa.int64())),
                    "hash": t["hash"],
                    "t": t["t"],
                }
            )

        idx = rd.read_parquet(idx_paths, columns=["clip", "hash", "t"]).map_batches(
            negate, batch_format="pyarrow"
        )
        tagged = tagged.union(idx)

    from data_quality_ray.pipelines.multimodal_dedup import landmark_match_pairs

    pairs = landmark_match_pairs(tagged, min_votes, FP_MAX_HASH_GROUP, bipartite=True)

    # 1) direct stored hits, then transitive closure over new×new edges:
    # a clip whose strong match chain reaches stored content is stored
    # content (edge set is match-pair-bounded, so the fixed point is cheap)
    hit_stored = set()
    new_edges: list[tuple[int, int]] = []
    for a, b in zip(pairs["a"], pairs["b"]):
        if a < 0 <= b:
            hit_stored.add(int(b))
        elif b < 0 <= a:
            hit_stored.add(int(a))
        elif a >= 0 and b >= 0:
            new_edges.append((int(a), int(b)))
    changed = True
    while changed:
        changed = False
        for a, b in new_edges:
            if (a in hit_stored) != (b in hit_stored):
                hit_stored.add(a if b in hit_stored else b)
                changed = True

    # 2) within-batch clusters among the remaining new clips: union-find,
    # rep (always the component minimum: larger root attaches under
    # smaller) is accepted, the rest rejected_in_batch
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in new_edges:
        if a not in hit_stored and b not in hit_stored:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    status = {}
    for cid in new_ids:
        if cid in hit_stored:
            status[cid] = "rejected_existing"
        elif find(cid) != cid:
            status[cid] = "rejected_in_batch"
        else:
            status[cid] = "accepted"
    accepted_ids = {c for c, s in status.items() if s == "accepted"}

    summary = {
        "batch_id": batch_id,
        "accepted": len(accepted_ids),
        "rejected_existing": sum(s == "rejected_existing" for s in status.values()),
        "rejected_in_batch": sum(s == "rejected_in_batch" for s in status.values()),
    }

    write_fn = None
    if accepted_ids:
        import ray as _ray

        acc_ref = _ray.put(accepted_ids)

        def keep_accepted(t: pa.Table) -> pa.Table:
            acc = np.fromiter(_ray.get(acc_ref), np.int64)
            mask = np.isin(t["clip"].to_numpy(), acc)
            t = t.filter(pa.array(mask))
            return t.append_column(
                "bucket",
                pc.cast(pc.bit_wise_and(t["hash"], N_CLIP_BUCKETS - 1), pa.int64()),
            )

        def write_fn(tmp_dir: str) -> None:
            fp.map_batches(keep_accepted, batch_format="pyarrow").write_parquet(
                tmp_dir, partition_cols=["bucket"]
            )

    return _commit_delta(index_dir, batch_id, summary, write_fn)


# ---------------------------------------------------------------------------
# Driver-facing demo: two deterministic batches over the synthetic clip
# table, planting every admit path — batch-002 re-sends batch-001 content
# re-keyed AND re-encoded+shifted (must be rejected_existing despite new
# bytes), adds fresh clips (accepted) and transcoded copies of those fresh
# clips (rejected_in_batch).
# ---------------------------------------------------------------------------

RE_KEY = 10_000_000
DUP_KEY = 20_000_000
_SHIFT_FRAMES = 8


def clip_content_ingest(
    clips_dir: str, index_root: str = "/tmp/graft_clip_ingest"
) -> pd.DataFrame:
    """Two-batch content-ingest demo over the clip table; returns one row
    per (batch, outcome) count. Fresh index per run (keyed by pid) so the
    query is deterministic under repetition; the index dir is removed on
    exit (success OR failure) to bound /tmp accumulation."""
    from data_quality_ray.pipelines.multimodal_dedup import transcode_shift_copies

    index_dir = os.path.join(index_root, f"run-{os.getpid()}")
    shutil.rmtree(index_dir, ignore_errors=True)
    cols = ["clip_id", "bytes", "sr_hz", "codec"]

    try:
        base = rd.read_parquet(clips_dir, columns=cols).limit(150)
        s1 = ingest_new_clips(base.limit(100), index_dir, "batch-001")

        def head_transcode(t: pa.Table) -> pa.Table:  # re-encoded batch-001 content
            return transcode_shift_copies(t, RE_KEY, _SHIFT_FRAMES)

        def tail_dup(t: pa.Table) -> pa.Table:  # in-batch dups of the fresh clips
            return transcode_shift_copies(t, DUP_KEY, _SHIFT_FRAMES)

        fresh = base.map_batches(
            lambda t: t.filter(
                pc.greater_equal(
                    pc.cast(pc.utf8_slice_codeunits(t["clip_id"], 5, 14), pa.int64()),
                    100,
                )
            ),
            batch_format="pyarrow",
        ).materialize()  # tiny (≤50 rows); referenced by two unions below
        b2 = (
            base.limit(50)
            .map_batches(head_transcode, batch_format="pyarrow")
            .union(fresh)
            .union(fresh.map_batches(tail_dup, batch_format="pyarrow"))
        )
        s2 = ingest_new_clips(b2, index_dir, "batch-002")

        rows = []
        for s in (s1, s2):
            for k in ("accepted", "rejected_existing", "rejected_in_batch"):
                rows.append({"batch_id": s["batch_id"], "outcome": k, "n": s[k]})
        return (
            pd.DataFrame(rows).sort_values(["batch_id", "outcome"]).reset_index(drop=True)
        )
    finally:
        shutil.rmtree(index_dir, ignore_errors=True)
