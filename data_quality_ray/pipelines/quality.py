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
    # Stage layout, chosen deliberately around Ray's operator-fusion rules:
    # - decode is the HEAVY stage and stateless → it must run as elastic
    #   TASKS on every free CPU, never inside a bounded actor pool. Task
    #   stages fuse into a following actor pool, which would swallow decode
    #   and cap it at the pool size — the decode stage therefore carries a
    #   distinct resource hint (memory), which legitimately describes its
    #   wide-binary batches AND makes its remote args fusion-incompatible.
    # - decode drops the ``bytes`` payload inside its own stage, so the wide
    #   binary column never crosses another operator boundary; everything
    #   downstream moves text + small feature columns only.
    # - scrub (cheap, text-only) fuses into the langid pool; rules/decision/
    #   split fuse into one task stage after the pools (actor→task never
    #   fuses).
    import functools

    pool = config.actor_pool_bounds()
    ds = ds.map_batches(
        functools.partial(decode_features, drop_payload=True),
        batch_format="pyarrow",
        batch_size=config.CLIP_BATCH_SIZE,
        # fusion-break + honest per-task footprint (~25 MB input block +
        # per-row transients); a larger hint counts against the operator's
        # memory budget and was MEASURED to throttle decode concurrency
        memory=64 * 1024 * 1024,
    )
    ds = ds.map_batches(scrub_batch, batch_format="pyarrow", batch_size=config.TEXT_BATCH_SIZE)
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


# Explicit partial schema: an empty batch (zero-row input file, or a
# kept_only block where every row was dropped) must yield a partial with
# EXACTLY these types — letting pandas infer dtypes from an empty groupby
# produces all-double columns that poison the block union downstream.
_LINEAGE_PARTIAL_SCHEMA = pa.schema(
    [
        ("lang", pa.string()),
        ("split", pa.string()),
        ("n", pa.int64()),
        ("kept", pa.int64()),
        ("ppl_sum", pa.float64()),
        ("score_sum", pa.float64()),
        ("good", pa.int64()),
        ("mid", pa.int64()),
        ("bad", pa.int64()),
        ("hash_sum", pa.int64()),
    ]
)


def _lineage_partial(batch: pa.Table) -> pa.Table:
    """ONE combiner for everything lineage needs: per-(lang, split) partial
    rows carrying counts, keep counts, ppl/score sums, bucket counts and an
    order-independent content-hash sum. One pass, one tiny driver combine —
    replaces three separate dataset executions."""
    import numpy as np
    import pandas as pd

    if batch.num_rows == 0:
        return _LINEAGE_PARTIAL_SCHEMA.empty_table()

    h = hash_binary_column(batch["transcript_scrubbed"])
    df = pd.DataFrame(
        {
            "lang": batch["lang"].to_pylist(),
            "split": batch["split"].to_pylist(),
            "keep": batch["keep"].to_numpy(zero_copy_only=False).astype(np.int64),
            "ppl": batch["ppl"].to_numpy(),
            "score": batch["quality_score"].to_numpy(),
            "bucket": batch["bucket"].to_pylist(),
        }
    )
    with np.errstate(over="ignore"):
        # two's-complement int64 reinterpretation: pandas/arrow carry it as
        # int64; the driver views the bits back as uint64 before summing
        hs = int(np.uint64(h.sum()).astype(np.int64))
    g = (
        df.groupby(["lang", "split"], sort=True)
        .agg(
            n=("keep", "size"),
            kept=("keep", "sum"),
            ppl_sum=("ppl", "sum"),
            score_sum=("score", "sum"),
            good=("bucket", lambda b: int((b == "good").sum())),
            mid=("bucket", lambda b: int((b == "mid").sum())),
            bad=("bucket", lambda b: int((b == "bad").sum())),
        )
        .reset_index()
    )
    g["hash_sum"] = ([hs] + [0] * (len(g) - 1)) if len(g) else []
    return pa.Table.from_pandas(g, preserve_index=False).cast(_LINEAGE_PARTIAL_SCHEMA)


def run_checkpointed(
    input_dir: str,
    out_dir: str,
    *,
    n_partitions: int = 4,
    resume: bool = True,
    kept_only: bool = False,
    annotate_fn=None,
    output_columns: list[str] | None = None,
    id_column: str = "clip_id",
) -> dict:
    """Quality pipeline over a directory of clip parquet files, resumable.

    The runner is annotation-agnostic: ``annotate_fn`` (default: the clip
    DAG) must emit the lineage contract columns (lang, split, keep, ppl,
    quality_score, bucket, transcript_scrubbed) plus ``id_column``;
    ``pipelines.documents.run_document_pipeline`` reuses this engine for
    the text-corpus flagship.

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
    os.makedirs(out_dir, exist_ok=True)
    if resume:
        todo = ckpt.pending(plan, out_dir)
    else:
        ckpt.pending(plan, out_dir)  # side effect: prune stale old-plan partitions
        todo = plan

    ann = annotate_fn if annotate_fn is not None else annotate
    for pid, part_files in sorted(todo.items()):
        ds = ann(read_clips(part_files))
        out_cols = output_columns or [f.name for f in schema.OUTPUT_SCHEMA]
        ds = ds.select_columns(out_cols)
        if kept_only:
            # annotate-then-select (§2.3 note): lineage stats below still
            # describe only what is WRITTEN — the kept subset
            import pyarrow.compute as _pc

            ds = ds.map_batches(
                lambda t: t.filter(_pc.field("keep")), batch_format="pyarrow"
            )
        # A crash between tmp-dir creation and ckpt.commit leaves an orphan
        # .tmp-{pid}-* dir that no later attempt reuses (fresh uuid each
        # time); sweep uncommitted leftovers for THIS partition before
        # creating the new one so crash-resume cycles don't accumulate them.
        import shutil as _shutil

        for stale in glob.glob(os.path.join(out_dir, f".tmp-{pid}-*")):
            _shutil.rmtree(stale, ignore_errors=True)
        tmp = os.path.join(out_dir, f".tmp-{pid}-{uuid.uuid4().hex[:8]}")
        os.makedirs(tmp, exist_ok=True)
        # ONE streaming execution: each task writes its block as a parquet
        # file under the partition tmp dir AND returns its lineage partial
        # (counts / per-lang sums / hash). The driver merges the tiny
        # partials — no second pass over the data, no mid-pipeline
        # materialization; the atomic rename in ckpt.commit publishes it.
        import numpy as np
        import pyarrow.parquet as pq_mod

        def write_and_stats(b: pa.Table) -> pa.Table:
            if b.num_rows:
                # DETERMINISTIC file name derived from the batch's identity
                # (first/last clip_id + row count): a Ray task retry that
                # reprocesses the same block overwrites the same file
                # instead of appending a second copy — the write is
                # idempotent, matching the lineage-record counts.
                import hashlib as _hl

                first = b[id_column][0].as_py()
                last = b[id_column][b.num_rows - 1].as_py()
                tag = _hl.blake2b(
                    f"{first}\x1f{last}\x1f{b.num_rows}".encode(), digest_size=12
                ).hexdigest()
                pq_mod.write_table(b, os.path.join(tmp, f"part-{tag}.parquet"))
            return _lineage_partial(b)

        parts = (
            ds.map_batches(write_and_stats, batch_format="pyarrow", batch_size=None)
            .to_pandas()
        )
        if "lang" not in parts.columns:
            # a fully-empty partition (zero-row input file) yields ZERO
            # blocks — map_batches never ran, so the frame has no columns;
            # substitute the schema-stable empty partial
            parts = _LINEAGE_PARTIAL_SCHEMA.empty_table().to_pandas()
        agg = (
            parts.groupby(["lang", "split"], sort=True)
            .agg(
                n=("n", "sum"), kept=("kept", "sum"), ppl_sum=("ppl_sum", "sum"),
                score_sum=("score_sum", "sum"), good=("good", "sum"),
                mid=("mid", "sum"), bad=("bad", "sum"),
            )
            .reset_index()
        )
        with np.errstate(over="ignore"):
            content_hash = int(
                parts["hash_sum"].to_numpy(dtype=np.int64).view(np.uint64).sum()
            )
        lineage = {
            "partition": pid,
            "files": [os.path.basename(f) for f in part_files],
            "rows": int(agg["n"].sum()),
            "kept": int(agg["kept"].sum()),
            "buckets": {
                "Good": int(agg["good"].sum()),
                "Mid": int(agg["mid"].sum()),
                "Bad": int(agg["bad"].sum()),
            },
            "langs": {
                f"{r.lang}/{r.split}": {
                    "n": int(r.n),
                    "kept": int(r.kept),
                    "mean_ppl": float(r.ppl_sum / r.n),
                    "mean_score": float(r.score_sum / r.n),
                }
                for r in agg.itertuples()
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
