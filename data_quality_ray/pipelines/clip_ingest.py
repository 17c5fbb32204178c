"""Incremental AUDIO-corpus ingest: admit new clips only if their CONTENT
is not already in the corpus — the audio twin of pipelines/ingest.py.

Text ingest can key on an exact md5 fingerprint; audio cannot (the same
recording arrives re-encoded, gain-adjusted, or padded with silence), so
membership here is decided by the constellation-fingerprint vote
(stages/fingerprint.py): a new clip is a duplicate of a stored one when
``min_votes`` landmark hashes agree on a single alignment offset — the
same evidence `clip_fingerprint_matches` uses, run against a STORED,
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

  - ``rejected_existing``  — aligned votes ≥ min_votes against ANY stored clip
  - ``rejected_in_batch``  — duplicate content within the batch; the
    cluster representative (lowest clip number) is accepted
  - ``accepted``           — everything else; landmarks appended to the index

Vote counting is two hash-partitioned shuffles over landmark rows with
all group work vectorized per partition (same shape and constants as
clip_fingerprint_matches); only verified match PAIRS reach the driver,
where within-batch duplicate clusters resolve by union-find (bounded by
match count — the repo-wide driver-CC contract, pipelines/dedup.py).
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

from data_quality_ray.stages.fingerprint import fingerprint_batch

N_CLIP_BUCKETS = 64
MIN_VOTES = 100
MAX_HASH_GROUP = 24


def _delta_paths(index_dir: str, buckets: "list[int]") -> "list[str]":
    """Committed landmark files for ONLY the touched buckets."""
    paths: list[str] = []
    for b in buckets:
        paths += _glob.glob(
            os.path.join(index_dir, "deltas", "*", f"bucket={b}", "*.parquet")
        )
    return sorted(paths)


def _match_pairs(tagged: "rd.Dataset", min_votes: int) -> pd.DataFrame:
    """(a, b, votes) verified content matches from tagged landmark rows.

    Sign convention: STORED clips carry negated ids (clip → −clip−1) so a
    re-sent id can never collide with its own stored landmarks and every
    pair's provenance is readable from its sign. Pairs are generated only
    when at least one side is new (stored×stored pairs are already settled
    history); the vote machinery is the vectorized partition-grain form of
    clip_fingerprint_matches."""

    def add_pkey(t: pa.Table) -> pa.Table:
        return t.append_column("pkey", pc.bit_wise_and(t["hash"], N_CLIP_BUCKETS - 1))

    def emit(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "a": pd.Series(dtype=np.int64),
                "b": pd.Series(dtype=np.int64),
                "dt": pd.Series(dtype=np.int32),
                "w": pd.Series(dtype=np.int64),
                "pk2": pd.Series(dtype=np.int64),
            }
        )
        h = g["hash"].to_numpy()
        c = g["clip"].to_numpy()
        t = g["t"].to_numpy()
        order = np.lexsort((c, h))
        h, c, t = h[order], c[order], t[order]
        starts = np.flatnonzero(np.r_[True, h[1:] != h[:-1]])
        lens = np.diff(np.r_[starts, len(h)])
        aa, bb, dts = [], [], []
        for s in range(2, MAX_HASH_GROUP + 1):
            gs = starts[lens == s]
            if len(gs) == 0:
                continue
            ii, jj = np.triu_indices(s, k=1)
            ia = (gs[:, None] + ii[None, :]).ravel()
            ib = (gs[:, None] + jj[None, :]).ravel()
            keep = (c[ia] >= 0) | (c[ib] >= 0)  # at least one new endpoint
            ia, ib = ia[keep], ib[keep]
            aa.append(c[ia])
            bb.append(c[ib])
            dts.append(t[ib] - t[ia])
        if not aa:
            return empty
        a = np.concatenate(aa)
        b = np.concatenate(bb)
        dt = np.concatenate(dts).astype(np.int32)
        swap = a > b
        a2 = np.where(swap, b, a)
        b2 = np.where(swap, a, b)
        dt = np.where(swap, -dt, dt).astype(np.int32)
        out = (
            pd.DataFrame({"a": a2, "b": b2, "dt": dt})
            .groupby(["a", "b", "dt"], as_index=False, sort=False)
            .size()
            .rename(columns={"size": "w"})
        )
        out["w"] = out["w"].astype(np.int64)
        out["pk2"] = ((out["a"] * 1_000_003 + out["b"]) % N_CLIP_BUCKETS).astype(np.int64)
        return out

    def score(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby(["a", "b", "dt"], as_index=False)["w"].sum()
        s = s.sort_values(["a", "b", "w", "dt"], ascending=[True, True, False, True])
        best = s.drop_duplicates(["a", "b"], keep="first")
        best = best[best["w"] >= min_votes]
        return pd.DataFrame(
            {
                "a": best["a"].to_numpy(np.int64),
                "b": best["b"].to_numpy(np.int64),
                "votes": best["w"].to_numpy(np.int64),
            }
        )

    out = (
        tagged.map_batches(add_pkey, batch_format="pyarrow")
        .groupby("pkey")
        .map_groups(emit, batch_format="pandas")
        .groupby("pk2")
        .map_groups(score, batch_format="pandas")
        .to_pandas()
    )
    if len(out) == 0:
        return pd.DataFrame(
            {
                "a": pd.Series(dtype=np.int64),
                "b": pd.Series(dtype=np.int64),
                "votes": pd.Series(dtype=np.int64),
            }
        )
    return out


def ingest_new_clips(
    new_clips: "rd.Dataset", index_dir: str, batch_id: str, min_votes: int = MIN_VOTES
) -> dict:
    """Admit ``new_clips`` (clip_id, bytes, sr_hz, codec) against the stored
    landmark index; returns the batch summary. Idempotent per batch_id."""
    delta_dir = os.path.join(index_dir, "deltas", batch_id)
    summary_path = os.path.join(delta_dir, "summary.json")
    if os.path.exists(summary_path):
        with open(summary_path) as f:
            return json.load(f)

    fp = new_clips.map_batches(fingerprint_batch, batch_format="pyarrow").materialize()
    # batch grain: driver-safe; unique() is None on a fully-empty dataset
    new_ids = sorted(int(x) for x in (fp.unique("clip") or []))
    if not new_ids:  # nothing decodable/fingerprintable: commit an empty delta
        summary = {
            "batch_id": batch_id,
            "accepted": 0,
            "rejected_existing": 0,
            "rejected_in_batch": 0,
        }
        tmp_dir = os.path.join(index_dir, f".tmp-{batch_id}")
        shutil.rmtree(tmp_dir, ignore_errors=True)
        os.makedirs(tmp_dir, exist_ok=True)
        with open(os.path.join(tmp_dir, "summary.json"), "w") as f:
            json.dump(summary, f)
        os.makedirs(os.path.join(index_dir, "deltas"), exist_ok=True)
        shutil.rmtree(delta_dir, ignore_errors=True)
        os.replace(tmp_dir, delta_dir)
        return summary
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

    pairs = _match_pairs(tagged, min_votes)
    # any match against a STORED (negative-id) clip settles the new clip
    hit_stored = set()
    for a, b in zip(pairs["a"], pairs["b"]):
        if a < 0 <= b:
            hit_stored.add(int(b))
        elif b < 0 <= a:
            hit_stored.add(int(a))
    # within-batch clusters: union-find over new×new matches (bounded by
    # verified-match count, the repo-wide driver-CC contract)
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in zip(pairs["a"], pairs["b"]):
        if a >= 0 and b >= 0 and a not in hit_stored and b not in hit_stored:
            ra, rb = find(int(a)), find(int(b))
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

    tmp_dir = os.path.join(index_dir, f".tmp-{batch_id}")
    shutil.rmtree(tmp_dir, ignore_errors=True)
    os.makedirs(tmp_dir, exist_ok=True)
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

        fp.map_batches(keep_accepted, batch_format="pyarrow").write_parquet(
            tmp_dir, partition_cols=["bucket"]
        )
    with open(os.path.join(tmp_dir, "summary.json"), "w") as f:
        json.dump(summary, f)
    os.makedirs(os.path.join(index_dir, "deltas"), exist_ok=True)
    shutil.rmtree(delta_dir, ignore_errors=True)  # only ever a crashed partial
    os.replace(tmp_dir, delta_dir)
    return summary


# ---------------------------------------------------------------------------
# Driver-facing demo: two deterministic batches over the synthetic clip
# table, planting every admit path — batch-002 re-sends batch-001 content
# re-keyed AND re-encoded+shifted (must be rejected_existing despite new
# bytes), adds fresh clips (accepted) and transcoded copies of those fresh
# clips (rejected_in_batch).
# ---------------------------------------------------------------------------

RE_KEY = 10_000_000
DUP_KEY = 20_000_000


def _transcode_shift(t: pa.Table, offset: int, shift_frames: int = 8) -> pa.Table:
    from data_quality_ray.functions import codecs
    from data_quality_ray.stages.fingerprint import FP_HOP

    _NEXT = {"pcm16": "ulaw", "ulaw": "alaw", "alaw": "pcm16", "wav": "ulaw"}
    ids, bufs, srs, cods = [], [], [], []
    for i in range(t.num_rows):
        sr = int(t["sr_hz"][i].as_py())
        codec = t["codec"][i].as_py()
        pcm = codecs.decode_tolerant(t["bytes"][i].as_py(), codec, sr)
        if pcm is None:
            continue
        pad = np.zeros(shift_frames * FP_HOP * sr // 16_000, dtype=pcm.dtype)
        pcm16 = np.clip(
            np.round(np.concatenate([pad, pcm]) * 32767.0), -32768, 32767
        ).astype(np.int16)
        new_codec = _NEXT.get(codec, "ulaw")
        num = int(str(t["clip_id"][i].as_py()).rsplit("-", 1)[-1]) + offset
        ids.append(f"clip-{num:09d}")
        bufs.append(codecs.encode(pcm16, new_codec, sr))
        srs.append(sr)
        cods.append(new_codec)
    return pa.table(
        {
            "clip_id": pa.array(ids, pa.string()),
            "bytes": pa.array(bufs, pa.binary()),
            "sr_hz": pa.array(srs, pa.int32()),
            "codec": pa.array(cods, pa.string()),
        }
    )


def clip_content_ingest(clips_dir: str, index_root: str = "/tmp/graft_clip_ingest") -> pd.DataFrame:
    """Two-batch content-ingest demo over the clip table; returns one row
    per (batch, outcome) count. Fresh index per run (keyed by pid) so the
    query is deterministic under repetition."""
    index_dir = os.path.join(index_root, f"run-{os.getpid()}")
    shutil.rmtree(index_dir, ignore_errors=True)
    cols = ["clip_id", "bytes", "sr_hz", "codec"]

    base = rd.read_parquet(clips_dir, columns=cols).limit(150)
    b1 = base.limit(100)
    s1 = ingest_new_clips(b1, index_dir, "batch-001")

    tail = rd.read_parquet(clips_dir, columns=cols).limit(150)

    def head_transcode(t: pa.Table) -> pa.Table:  # re-encoded batch-001 content
        return _transcode_shift(t, RE_KEY)

    def tail_dup(t: pa.Table) -> pa.Table:  # in-batch dups of the fresh clips
        return _transcode_shift(t, DUP_KEY)

    first50 = base.limit(50)
    fresh = tail.map_batches(
        lambda t: t.filter(
            pc.greater_equal(
                pc.cast(pc.utf8_slice_codeunits(t["clip_id"], 5, 14), pa.int64()), 100
            )
        ),
        batch_format="pyarrow",
    )
    b2 = (
        first50.map_batches(head_transcode, batch_format="pyarrow")
        .union(fresh)
        .union(fresh.map_batches(tail_dup, batch_format="pyarrow"))
    )
    s2 = ingest_new_clips(b2, index_dir, "batch-002")

    rows = []
    for s in (s1, s2):
        for k in ("accepted", "rejected_existing", "rejected_in_batch"):
            rows.append({"batch_id": s["batch_id"], "outcome": k, "n": s[k]})
    shutil.rmtree(index_dir, ignore_errors=True)
    return pd.DataFrame(rows).sort_values(["batch_id", "outcome"]).reset_index(drop=True)
