"""Incremental corpus ingest with dedup against a STORED fingerprint index.

The missing piece between one-shot dedup (pipelines/dedup.py) and a living
training corpus: new crawl batches arrive over time and each must be
admitted only if its content is not already in the corpus. The reference
has no such operator (its scope is single-run scoring —
annotator_agreement/core.py); this is the graft-added "shared mutable
index" case done dataset-natively instead of with a raw index actor.

Index layout (append-only, no in-place mutation anywhere):

    index_dir/
      deltas/<batch_id>/            one dir per COMMITTED ingest batch
        summary.json                  batch outcome (also the idempotence key)
        bucket=NN/*.parquet           accepted (fingerprint, doc_id) rows
        bloom.npz                     per-bucket Bloom sidecars (8 KB each)
      .tmp-<batch_id>/              staging — renamed into place atomically

A batch commits by a single atomic directory rename, so a crashed ingest
leaves only a .tmp dir (ignored by readers) and a re-run of the same
``batch_id`` is a no-op that returns the recorded summary — the same
commit discipline as state/checkpoint.py, at batch grain.

Scale shape: fingerprints are md5 of normalized text (identical to
``exact_dedup``'s key, so the whole flow is SQL-reproducible); rows are
hash-bucketed and the index is PARTITION-PRUNED — an ingest reads only
the ``bucket=NN`` files its batch actually touches, never the whole
index — and BLOOM-PRUNED on top: each delta carries per-bucket Bloom
sidecars (functions/sketches.py), probed distributed, so delta files
whose filters definitely exclude every batch fingerprint are skipped
entirely (a mostly-novel crawl increment reads almost none of the
index). A delta lacking a sidecar is always read (safe fallback). The admit decision runs inside ``groupby(bucket)`` groups where a
fingerprint's full history is co-located, so it is exact and local; only
the ≤3-row status count reaches the driver. At 100 TB the index is still
one parquet tree; a batch's cost is O(batch + touched buckets).
"""

from __future__ import annotations

import glob as _glob
import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

from data_quality_ray.functions import text as T
from data_quality_ray.functions.sketches import (
    bloom_add,
    bloom_empty,
    bloom_merge,
    bloom_might_contain,
)

N_INGEST_BUCKETS = 64
BLOOM_SIDECAR = "bloom.npz"


def _fp_keys(fps: "pa.Array | pa.ChunkedArray | list[str]") -> np.ndarray:
    """uint64 bloom keys from md5-hex fingerprints (first 16 hex chars —
    uniform by construction)."""
    it = fps.to_pylist() if isinstance(fps, (pa.Array, pa.ChunkedArray)) else fps
    return np.fromiter(
        (int(f[:16], 16) for f in it), dtype=np.uint64, count=len(it)
    )

_FP_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("fingerprint", pa.string()),
        ("bucket", pa.int64()),
        ("kind", pa.int8()),  # 0 = already-indexed row, 1 = new row
    ]
)


def _fingerprint_batch(t: pa.Table) -> pa.Table:
    """(doc_id, text) → (doc_id, fingerprint, bucket, kind=1).

    Same normalize+md5 key as ``exact_dedup`` (dedup.py:66) so the DuckDB
    oracle can reproduce admit decisions exactly; bucket = first two hex
    digits mod N_INGEST_BUCKETS (a pure function of the fingerprint)."""
    import hashlib

    fps = [
        hashlib.md5(T.normalize_for_fingerprint(x or "").encode()).hexdigest()
        for x in t["text"].to_pylist()
    ]
    bucket = np.array([int(f[:2], 16) % N_INGEST_BUCKETS for f in fps], dtype=np.int64)
    return pa.table(
        {
            "doc_id": t["doc_id"].cast(pa.int64()),
            "fingerprint": pa.array(fps, pa.string()),
            "bucket": pa.array(bucket, pa.int64()),
            "kind": pa.array(np.ones(len(fps), dtype=np.int8), pa.int8()),
        }
    ).cast(_FP_SCHEMA)


def _index_paths(index_dir: str, buckets: "list[int]") -> "list[str]":
    """Committed index files for ONLY the given buckets (partition pruning).

    Committed ⇔ the delta dir exists under deltas/ (the atomic-rename
    commit); staging ``.tmp-*`` dirs never match this glob."""
    paths: list[str] = []
    for b in buckets:
        paths += _glob.glob(os.path.join(index_dir, "deltas", "*", f"bucket={b}", "*.parquet"))
    return sorted(paths)


def _delta_blooms(index_dir: str) -> "dict[str, dict[int, np.ndarray] | None]":
    """Per-committed-delta bloom sidecars: {delta_id: {bucket: bits}};
    value ``None`` marks a delta without a sidecar (pre-bloom layout) whose
    files must be read unconditionally. Driver cost: #deltas × ≤8 KB/bucket."""
    out: dict[str, dict[int, np.ndarray] | None] = {}
    for d in sorted(_glob.glob(os.path.join(index_dir, "deltas", "*"))):
        if not os.path.isdir(d):
            continue
        did = os.path.basename(d)
        side = os.path.join(d, BLOOM_SIDECAR)
        if not os.path.exists(side):
            out[did] = None
            continue
        with np.load(side) as z:
            out[did] = {int(k[1:]): z[k] for k in z.files}
    return out


def _bloom_pruned_paths(
    index_dir: str, fp: "rd.Dataset", buckets: "list[int]"
) -> "list[str]":
    """Index files the batch must actually read: bucket pruning AND per-key
    bloom tests against each delta's sidecar.

    The test is DISTRIBUTED — blooms broadcast once via ``ray.put``, each
    fingerprint block probes them vectorized and emits only the distinct
    (delta, bucket) pairs with ≥1 maybe-hit — so the driver never holds the
    batch's keys; a bloom miss is definite (skips the file), a hit is
    conservative (reads it). Deltas without a sidecar are always read."""
    blooms = _delta_blooms(index_dir)
    if not blooms:
        return []
    with_bloom = {d: b for d, b in blooms.items() if b is not None}
    always = [d for d, b in blooms.items() if b is None]
    hit_pairs: "set[tuple[str, int]]" = set()
    if with_bloom:
        bref = ray.put(with_bloom)

        def probe(t: pa.Table) -> pa.Table:
            bl = ray.get(bref)
            keys = _fp_keys(t["fingerprint"])
            bk = t["bucket"].to_numpy()
            ds_, bs_ = [], []
            for did, per_bucket in bl.items():
                for b in np.unique(bk):
                    bits = per_bucket.get(int(b))
                    if bits is None:
                        continue
                    if bloom_might_contain(bits, keys[bk == b]).any():
                        ds_.append(did)
                        bs_.append(int(b))
            return pa.table(
                {"delta": pa.array(ds_, pa.string()), "bucket": pa.array(bs_, pa.int64())}
            )

        for r in fp.map_batches(probe, batch_format="pyarrow").take_all():
            hit_pairs.add((r["delta"], int(r["bucket"])))

    paths: list[str] = []
    for did, b in sorted(hit_pairs):
        paths += _glob.glob(
            os.path.join(index_dir, "deltas", did, f"bucket={b}", "*.parquet")
        )
    for did in always:
        for b in buckets:
            paths += _glob.glob(
                os.path.join(index_dir, "deltas", did, f"bucket={b}", "*.parquet")
            )
    return sorted(paths)


def ingest_new_docs(new_docs: "rd.Dataset", index_dir: str, batch_id: str) -> dict:
    """Admit ``new_docs`` (needs doc_id:int64, text:string) against the
    index at ``index_dir``; returns the batch summary.

    Per-row outcome: ``accepted`` (fingerprint unseen — recorded in the
    index), ``rejected_existing`` (fingerprint already indexed), or
    ``rejected_in_batch`` (duplicate within this batch; the lowest doc_id
    of each unseen fingerprint wins). Idempotent per ``batch_id``.
    """
    delta_dir = os.path.join(index_dir, "deltas", batch_id)
    summary_path = os.path.join(delta_dir, "summary.json")
    if os.path.exists(summary_path):
        with open(summary_path) as f:
            return json.load(f)

    fp = new_docs.map_batches(_fingerprint_batch, batch_format="pyarrow").materialize()
    buckets = sorted(int(b) for b in fp.unique("bucket"))  # ≤ N_INGEST_BUCKETS values
    idx_paths = _bloom_pruned_paths(index_dir, fp, buckets)
    if idx_paths:
        idx = rd.read_parquet(idx_paths, columns=["fingerprint", "bucket"]).map_batches(
            lambda t: pa.table(
                {
                    "doc_id": pa.array(np.full(t.num_rows, -1, np.int64), pa.int64()),
                    "fingerprint": t["fingerprint"],
                    "bucket": t["bucket"].cast(pa.int64()),
                    "kind": pa.array(np.zeros(t.num_rows, np.int8), pa.int8()),
                }
            ).cast(_FP_SCHEMA),
            batch_format="pyarrow",
        )
        tagged = fp.union(idx)
    else:
        tagged = fp

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        known = set(g.loc[g["kind"] == 0, "fingerprint"])
        new = g.loc[g["kind"] == 1].sort_values(["doc_id"], kind="mergesort")
        in_index = new["fingerprint"].isin(known).to_numpy()
        first = (~new["fingerprint"].duplicated()).to_numpy()
        status = np.where(
            in_index, "rejected_existing", np.where(first, "accepted", "rejected_in_batch")
        )
        out = new[["doc_id", "fingerprint", "bucket"]].copy()
        out["status"] = status
        return out

    resolved = (
        tagged.groupby("bucket").map_groups(resolve, batch_format="pandas").materialize()
    )

    from ray.data.aggregate import Count as _Count

    counts = {
        r["status"]: int(r["count()"])
        for r in resolved.groupby("status").aggregate(_Count()).take_all()
    }
    summary = {
        "batch_id": batch_id,
        "accepted": counts.get("accepted", 0),
        "rejected_existing": counts.get("rejected_existing", 0),
        "rejected_in_batch": counts.get("rejected_in_batch", 0),
    }

    tmp_dir = os.path.join(index_dir, f".tmp-{batch_id}")
    import shutil

    shutil.rmtree(tmp_dir, ignore_errors=True)
    os.makedirs(tmp_dir, exist_ok=True)
    import pyarrow.compute as pc

    accepted = resolved.map_batches(
        lambda t: t.filter(pc.equal(t["status"], "accepted")).select(
            ["fingerprint", "doc_id", "bucket"]
        ),
        batch_format="pyarrow",
    )
    if summary["accepted"]:
        accepted.write_parquet(tmp_dir, partition_cols=["bucket"])

        # bloom sidecar: fixed-size per-bucket filters so future ingests can
        # skip this delta's files on a definite miss; partials built
        # per-block and OR-merged (associative) — ≤ buckets×blocks tiny rows
        def bloom_partials(t: pa.Table) -> pa.Table:
            bks = t["bucket"].to_numpy()
            keys = _fp_keys(t["fingerprint"])
            bs, blobs = [], []
            for b in np.unique(bks):
                bs.append(int(b))
                blobs.append(bloom_add(bloom_empty(), keys[bks == b]).tobytes())
            return pa.table(
                {"bucket": pa.array(bs, pa.int64()), "bits": pa.array(blobs, pa.binary())}
            )

        merged: dict[int, np.ndarray] = {}
        for r in accepted.map_batches(bloom_partials, batch_format="pyarrow").take_all():
            bits = np.frombuffer(r["bits"], dtype=np.uint8)
            b = int(r["bucket"])
            merged[b] = bloom_merge(merged[b], bits) if b in merged else bits.copy()
        np.savez(
            os.path.join(tmp_dir, BLOOM_SIDECAR),
            **{f"b{b}": bits for b, bits in merged.items()},
        )
    else:
        np.savez(os.path.join(tmp_dir, BLOOM_SIDECAR))  # definite-empty delta
    with open(os.path.join(tmp_dir, "summary.json"), "w") as f:
        json.dump(summary, f)
    os.makedirs(os.path.join(index_dir, "deltas"), exist_ok=True)
    shutil.rmtree(delta_dir, ignore_errors=True)  # only ever a crashed partial
    os.replace(tmp_dir, delta_dir)
    return summary


def accepted_doc_ids(index_dir: str) -> "rd.Dataset":
    """The whole corpus membership as a Dataset (doc_id, fingerprint) —
    reads every committed delta; for bucket-scoped lookups use
    ``_index_paths`` instead."""
    paths = sorted(
        _glob.glob(os.path.join(index_dir, "deltas", "*", "bucket=*", "*.parquet"))
    )
    if not paths:
        return rd.from_arrow(
            pa.schema([("fingerprint", pa.string()), ("doc_id", pa.int64())]).empty_table()
        )
    return rd.read_parquet(paths, columns=["fingerprint", "doc_id"])


# ---------------------------------------------------------------------------
# Driver-facing demo query: two deterministic batches over the documents
# table — batch-001 = even doc_ids; batch-002 = ALL docs plus the odd docs
# re-keyed (+RE_KEY_OFFSET), planting index-hits AND in-batch duplicates so
# every admit path shows in the result. Fresh index per run; every count is
# reproducible in SQL from the md5 fingerprints.
# ---------------------------------------------------------------------------

RE_KEY_OFFSET = 1_000_000


def corpus_ingest(sf_dir: str, index_root: str = "/tmp/graft_ingest") -> pd.DataFrame:
    import shutil

    index_dir = os.path.join(
        index_root, os.path.basename(os.path.normpath(sf_dir)) or "sf"
    )
    shutil.rmtree(index_dir, ignore_errors=True)

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )

    def _even(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        return t.filter(pa.array(ids % 2 == 0))

    def _odd_rekeyed(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        t = t.filter(pa.array(ids % 2 == 1))
        return t.set_column(
            t.schema.get_field_index("doc_id"),
            "doc_id",
            pa.array(t["doc_id"].to_numpy() + RE_KEY_OFFSET, pa.int64()),
        )

    even = docs.map_batches(_even, batch_format="pyarrow")
    batch2 = docs.union(docs.map_batches(_odd_rekeyed, batch_format="pyarrow"))
    s1 = ingest_new_docs(even, index_dir, "batch-001")
    s2 = ingest_new_docs(batch2, index_dir, "batch-002")
    out = pd.DataFrame([s1, s2])[
        ["batch_id", "accepted", "rejected_existing", "rejected_in_batch"]
    ]
    for c in out.columns[1:]:
        out[c] = out[c].astype("int64")
    return out.sort_values("batch_id").reset_index(drop=True)


CORPUS_INGEST_SQL = rf"""
WITH fp AS (
  SELECT doc_id,
         md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS f
  FROM documents
),
b1 AS (SELECT * FROM fp WHERE doc_id % 2 = 0),
b2 AS (
  SELECT * FROM fp
  UNION ALL
  SELECT doc_id + {RE_KEY_OFFSET}, f FROM fp WHERE doc_id % 2 = 1
),
b1s AS (
  SELECT CAST(count(DISTINCT f) AS BIGINT) AS accepted,
         CAST(0 AS BIGINT) AS rejected_existing,
         CAST(count(*) - count(DISTINCT f) AS BIGINT) AS rejected_in_batch
  FROM b1
),
b2s AS (
  SELECT CAST(count(DISTINCT f) FILTER (WHERE NOT seen) AS BIGINT) AS accepted,
         CAST(count(*) FILTER (WHERE seen) AS BIGINT) AS rejected_existing,
         CAST(count(*) FILTER (WHERE NOT seen)
              - count(DISTINCT f) FILTER (WHERE NOT seen) AS BIGINT)
           AS rejected_in_batch
  FROM (SELECT f, f IN (SELECT f FROM b1) AS seen FROM b2)
)
SELECT 'batch-001' AS batch_id, * FROM b1s
UNION ALL
SELECT 'batch-002' AS batch_id, * FROM b2s
ORDER BY batch_id
"""
