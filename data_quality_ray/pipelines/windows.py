"""Windowed symbolic/lineage pipeline — the reference's third entry point
(``create_symbolic_dataset``, SURVEY.md §3.3) re-expressed deterministic.

Reference shape (eeg_datasets.py:36-107): tumbling windows of 30 consecutive
epochs in FILE ROW ORDER; window class = 0 iff every epoch in the window has
quality 1.0 (eeg_datasets.py:77-78); per-epoch symbolic fact strings
``seq(id, state(label), t)`` joined with a trailing window-class fact; global
``sequence_number`` ids and unseeded Bernoulli window-grain split.

Divergences (documented in SURVEY.md §7.4, required for determinism):
- windows keyed by ``(fragment, row_index // 30)`` derived from the clip id
  (the reference's os.listdir-order global counter cannot exist in a
  distributed DAG);
- split = md5 hash of the window id (reference: unseeded random.random()).

The window aggregation itself is fragment-local (windows never cross file
boundaries, matching eeg_datasets.py:70), so it needs NO shuffle: each
window's rows are contiguous in the annotated table; a groupby on window_id
keeps it correct under any blocking.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

WINDOW = 30
FRAG_ROWS = 2500  # rows per synthetic input fragment (synth/clips.py shard)


def _row_index(clip_id: str) -> int | None:
    """Numeric row index from a 'prefix-<int>' clip id; None if absent."""
    tail = clip_id.rsplit("-", 1)[-1]
    return int(tail) if tail.isdigit() else None


def fragment_key(clip_id: str) -> str:
    """Deterministic fragment key: row-index grouping for sequential ids,
    falling back to the id itself (one 'fragment' per id prefix-free corpus
    still splits deterministically — tolerant-by-design, never raises)."""
    idx = _row_index(clip_id)
    if idx is None:
        return f"frag-{clip_id}"
    return f"frag-{idx // FRAG_ROWS:05d}"


def _window_id(clip_id: str) -> str:
    """Deterministic window key from the clip id's row index."""
    idx = _row_index(clip_id)
    if idx is None:
        return f"f-{clip_id}-w0000"  # unknown layout: one window per clip
    frag, row = divmod(idx, FRAG_ROWS)
    return f"f{frag:05d}-w{row // WINDOW:04d}"


def add_window_id(batch: pa.Table) -> pa.Table:
    wid = [_window_id(c) for c in batch["clip_id"].to_pylist()]
    return batch.append_column("window_id", pa.array(wid, pa.string()))


N_WINDOW_PKEYS = 64


def add_window_pkey(batch: pa.Table) -> pa.Table:
    """Bounded shard key for the window shuffle (hash(window_id) & 63)."""
    wids = batch["window_id"].to_numpy(zero_copy_only=False)
    pk = (pd.util.hash_array(wids) % np.uint64(N_WINDOW_PKEYS)).astype(np.int32)
    return batch.append_column("pkey", pa.array(pk, pa.int32()))


def _window_records_shard(g: pd.DataFrame) -> pd.DataFrame:
    """All windows of one bounded shard in one call: window count grows with
    the corpus (rows/WINDOW), so the Ray shuffle key must stay the 64-way
    pkey — never one UDF call per window (the CLAUDE.md scale-killer).
    One in-shard sort + a single pandas groupby aggregates every window;
    the per-row fact strings and per-window closers are the output payload
    itself, not dispatch overhead.

    Class semantics mirror eeg_datasets.py:77-78: class 0 iff every row in
    the window has quality_score == 1.0, else 1. Facts mirror the
    ``seq(id, state(x), t)`` shape (eeg_datasets.py:80-89) with the bucket
    as the state vocabulary.
    """
    from data_quality_ray.functions.hashing import split_of

    g = g.sort_values(["window_id", "clip_id"], kind="mergesort")
    t = g.groupby("window_id", sort=False).cumcount().to_numpy()
    g = g.assign(
        fact=[
            f"seq({w}, state({b}), {tt})"
            for w, b, tt in zip(g["window_id"], g["bucket"], t)
        ],
        kept=g["keep"].astype(np.int64),
    )
    agg = g.groupby("window_id", sort=False).agg(
        n_rows=("clip_id", "size"),
        min_score=("quality_score", "min"),
        n_kept=("kept", "sum"),
        facts=("fact", ". ".join),
    )
    agg = agg.reset_index()
    cls = np.where(agg["min_score"].to_numpy() == 1.0, 0, 1).astype(np.int64)
    agg["window_class"] = cls
    agg["facts"] = [
        f"{f}. class({w}, {c})"
        for f, w, c in zip(agg["facts"], agg["window_id"], cls)
    ]
    agg["split"] = [split_of(w) for w in agg["window_id"]]
    agg["n_rows"] = agg["n_rows"].astype(np.int64)
    agg["n_kept"] = agg["n_kept"].astype(np.int64)
    return agg[["window_id", "n_rows", "window_class", "n_kept", "facts", "split"]]


def window_records(annotated: "object") -> "object":
    """Annotated clip Dataset → one summary row per tumbling window."""
    return (
        annotated.map_batches(add_window_id, batch_format="pyarrow")
        .map_batches(add_window_pkey, batch_format="pyarrow")
        .groupby("pkey")
        .map_groups(_window_records_shard, batch_format="pandas")
    )


def create_window_dataset(clips_dir: str, out_dir: str) -> dict:
    """Full pipeline: annotate → window records → parquet by split.

    Returns {split: {class: count}} (the reference's class_counter role,
    eeg_datasets.py:47-50, computed distributed)."""
    import ray.data as rd

    from data_quality_ray.pipelines import quality

    ds = quality.annotate(quality.read_clips(clips_dir))
    recs = window_records(ds)
    recs.write_parquet(out_dir, partition_cols=["split"])
    out: dict[str, dict[int, int]] = {}
    for r in (
        rd.read_parquet(out_dir, columns=["split", "window_class"])
        .groupby(["split", "window_class"])
        .count()
        .take_all()
    ):
        out.setdefault(r["split"], {})[int(r["window_class"])] = int(r["count()"])
    return out
