"""The flagship quality-filter pipeline (SURVEY.md §3.1 graft shape).

    read_parquet(clips)
      → map_batches(decode_features)        audio decode + features (tasks)
      → drop bytes                          (wide binary leaves the plane early)
      → map_batches(scrub)                  PII/toxicity rewrite (tasks)
      → map_batches(LangIdStage, actors)    hashed-trigram NB, weights per actor
      → map_batches(PerplexityStage, actors)char n-gram LM, weights per actor
      → map_batches(rules)                  heuristic flags (tasks)
      → map_batches(decision)               discrete score / keep / bucket
      → map_batches(split)                  deterministic hash split
      → [lang_stats ∥ bucket_counts ∥ write_parquet per partition + lineage]

No joins, no mid-pipeline materialization: the reference's positional join
of two scorer branches (runme.py:47-58, J1) is replaced by sequential
column-appending stages on the same stream. The only shuffles are the tiny
post-combine stats groupbys (stages/stats.py).
"""

from __future__ import annotations

import glob
import os
import uuid

import pyarrow as pa

import ray.data as rd

from data_quality_ray import config, schema
from data_quality_ray.functions.hashing import hash_binary_column
from data_quality_ray.stages.decode import decode_features
from data_quality_ray.stages.decision import decision_batch
from data_quality_ray.stages.langid import LangIdStage
from data_quality_ray.stages.perplexity import PerplexityStage
from data_quality_ray.stages.rules import rules_batch
from data_quality_ray.stages.scrub import scrub_batch
from data_quality_ray.stages.split import split_batch
from data_quality_ray.stages.stats import bucket_counts, lang_stats
from data_quality_ray.state import checkpoint as ckpt


def read_clips(path: str | list[str], *, columns: list[str] | None = None) -> "rd.Dataset":
    """Read a clip table (parquet now; Lance seam when importable)."""
    return rd.read_parquet(path, columns=columns)


def annotate(ds: "rd.Dataset", *, validate: bool = True) -> "rd.Dataset":
    """Full annotation DAG: input clip Dataset → per-clip decision columns."""
    if validate:
        s = ds.schema()
        schema.validate_clip_schema(
            pa.schema([pa.field(n, t) for n, t in zip(s.names, s.types)])
        )
    ds = ds.map_batches(
        decode_features, batch_format="pyarrow", batch_size=config.CLIP_BATCH_SIZE
    )
    ds = ds.drop_columns(["bytes"])
    ds = ds.map_batches(scrub_batch, batch_format="pyarrow", batch_size=config.TEXT_BATCH_SIZE)
    pool = config.actor_pool_bounds()
    ds = ds.map_batches(
        LangIdStage,
        batch_format="pyarrow",
        batch_size=config.TEXT_BATCH_SIZE,
        concurrency=pool,
    )
    ds = ds.map_batches(
        PerplexityStage,
        batch_format="pyarrow",
        batch_size=config.TEXT_BATCH_SIZE,
        concurrency=pool,
    )
    ds = ds.map_batches(rules_batch, batch_format="pyarrow", batch_size=config.TEXT_BATCH_SIZE)
    ds = ds.map_batches(decision_batch, batch_format="pyarrow", batch_size=config.TEXT_BATCH_SIZE)
    ds = ds.map_batches(split_batch, batch_format="pyarrow", batch_size=config.TEXT_BATCH_SIZE)
    return ds


def kept(ds: "rd.Dataset") -> "rd.Dataset":
    """Annotate-then-select (the reference labels, then selects — §2.3 note)."""
    import pyarrow.compute as pc

    return annotate(ds).map_batches(
        lambda t: t.filter(pc.field("keep")), batch_format="pyarrow"
    )


def _content_hash_sum(batch: pa.Table) -> pa.Table:
    """Order-independent content hash partial: sum of row hashes mod 2^64."""
    import numpy as np

    h = hash_binary_column(batch["transcript_scrubbed"])
    with np.errstate(over="ignore"):
        s = np.uint64(h.sum())
    return pa.table({"hash_sum": pa.array([int(s)], pa.uint64()), "rows": pa.array([len(h)], pa.int64())})


def run_checkpointed(
    input_dir: str,
    out_dir: str,
    *,
    n_partitions: int = 4,
    resume: bool = True,
) -> dict:
    """Quality pipeline over a directory of clip parquet files, resumable.

    Each partition (a contiguous slice of input files) streams through the
    full DAG and commits atomically: data files + a lineage JSON with row /
    keep counts, bucket counts, per-language stats and an order-independent
    content hash. A rerun skips committed partitions (no duplicate rows —
    the failure mode of the reference's append-CSV sink, eeg_datasets.py:100).

    Returns the merged lineage summary.
    """
    files = sorted(glob.glob(os.path.join(input_dir, "*.parquet")))
    if not files:
        raise FileNotFoundError(f"no parquet files in {input_dir}")
    plan = ckpt.partition_plan(files, n_partitions)
    todo = ckpt.pending(plan, out_dir) if resume else plan
    os.makedirs(out_dir, exist_ok=True)

    for pid, part_files in sorted(todo.items()):
        ds = annotate(read_clips(part_files))
        out_cols = [f.name for f in schema.OUTPUT_SCHEMA]
        ds = ds.select_columns(out_cols)
        tmp = os.path.join(out_dir, f".tmp-{pid}-{uuid.uuid4().hex[:8]}")
        ds.write_parquet(tmp)  # ONE streaming pass writes the data
        # lineage stats: second, cheap pass over the *written* files with
        # column pruning — never materializes the partition in memory
        stat_ds = rd.read_parquet(
            tmp,
            columns=["lang", "split", "keep", "ppl", "quality_score", "bucket",
                     "transcript_scrubbed"],
        )
        stats_tbl = lang_stats(stat_ds).to_pandas()
        buckets = bucket_counts(stat_ds)
        import numpy as np

        hparts = stat_ds.map_batches(_content_hash_sum, batch_format="pyarrow").to_pandas()
        with np.errstate(over="ignore"):
            content_hash = int(np.uint64(hparts["hash_sum"].to_numpy(dtype=np.uint64).sum()))
        lineage = {
            "partition": pid,
            "files": [os.path.basename(f) for f in part_files],
            "rows": int(hparts["rows"].sum()),
            "kept": int(stats_tbl["n_kept"].sum()),
            "buckets": buckets,
            "langs": {
                f"{r.lang}/{r.split}": {
                    "n": int(r.n_clips),
                    "kept": int(r.n_kept),
                    "mean_ppl": float(r.mean_ppl),
                    "mean_score": float(r.mean_score),
                }
                for r in stats_tbl.itertuples()
            },
            "content_hash": content_hash,
        }
        ckpt.commit(out_dir, pid, tmp, lineage)

    all_lineage = ckpt.read_lineage(out_dir)
    total = {
        "partitions": len(all_lineage),
        "rows": sum(l["rows"] for l in all_lineage.values()),
        "kept": sum(l["kept"] for l in all_lineage.values()),
        "buckets": {
            k: sum(l["buckets"][k] for l in all_lineage.values()) for k in ("Good", "Mid", "Bad")
        },
    }
    return total
