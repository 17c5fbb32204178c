"""Aggregate stages: per-language stats and bucket counts, skew-aware.

Reference analogues: ``make_stats`` global bucket counts (runme.py:17-36)
and the nested split×class counters (eeg_datasets.py:47-50). Re-expressed as
Ray Data aggregations with an explicit **partial-aggregation (combiner)**
step: per-batch ``map_batches`` reduces each block to one row per group
BEFORE the shuffle, so the all-to-all exchange moves O(groups × blocks)
rows, not O(rows) — the salting strategy for the Zipfian language skew
named in the north rule. A final tiny ``groupby`` merges the partials.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data
from ray.data.aggregate import Count, Sum


def _partial_lang_stats(batch: pa.Table) -> pa.Table:
    """Combiner: one row per (lang, split) per batch."""
    df = pd.DataFrame(
        {
            "lang": batch["lang"].to_pylist(),
            "split": batch["split"].to_pylist(),
            "keep": batch["keep"].to_numpy(zero_copy_only=False).astype(np.int64),
            "ppl": batch["ppl"].to_numpy(),
            "score": batch["quality_score"].to_numpy(),
        }
    )
    g = (
        df.groupby(["lang", "split"], sort=True)
        .agg(
            n=("keep", "size"),
            kept=("keep", "sum"),
            ppl_sum=("ppl", "sum"),
            score_sum=("score", "sum"),
        )
        .reset_index()
    )
    return pa.Table.from_pandas(g, preserve_index=False)


def lang_stats(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Per-(lang, split) stats: count, kept count, mean ppl, mean score.

    Two-phase: map-side combine then a groupby over ~|langs|×|splits| partial
    rows — the shuffle input is tiny regardless of input skew.
    """
    partial = ds.map_batches(_partial_lang_stats, batch_format="pyarrow")
    agg = partial.groupby(["lang", "split"]).aggregate(
        Sum("n", alias_name="n_clips"),
        Sum("kept", alias_name="n_kept"),
        Sum("ppl_sum", alias_name="ppl_sum"),
        Sum("score_sum", alias_name="score_sum"),
    )

    def finalize(batch: pa.Table) -> pa.Table:
        n = batch["n_clips"].to_numpy().astype(np.float64)
        return (
            batch.append_column(
                "mean_ppl", pa.array(batch["ppl_sum"].to_numpy() / n, pa.float64())
            )
            .append_column(
                "mean_score", pa.array(batch["score_sum"].to_numpy() / n, pa.float64())
            )
            .drop_columns(["ppl_sum", "score_sum"])
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


def _partial_bucket_counts(batch: pa.Table) -> pa.Table:
    df = pd.DataFrame({"bucket": batch["bucket"].to_pylist()})
    g = df.groupby("bucket", sort=True).size().reset_index(name="n")
    return pa.Table.from_pandas(g, preserve_index=False)


def bucket_counts(ds: "ray.data.Dataset") -> dict[str, int]:
    """Global {good, mid, bad} counts (runme.py:35-36's quality_stats.json)."""
    partial = ds.map_batches(_partial_bucket_counts, batch_format="pyarrow")
    out = partial.groupby("bucket").aggregate(Sum("n", alias_name="n")).take_all()
    counts = {r["bucket"]: int(r["n"]) for r in out}
    return {"Good": counts.get("good", 0), "Mid": counts.get("mid", 0), "Bad": counts.get("bad", 0)}
