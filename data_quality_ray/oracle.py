"""Single-process oracle — the reference-role stand-in (FIXTURES.md §3).

Runs the same per-clip math as the distributed pipeline but as a plain
sequential composition over one pyarrow Table, with **no Ray import**. The
correctness gate (tests/test_pipeline_e2e.py) compares the Ray pipeline
against this oracle row-by-row: keep/drop F1 ≥ 0.99 (exact in practice) and
byte-exact ``transcript_scrubbed`` equality, mirroring how the reference's
``runme.py`` is one sequential process (SURVEY.md §3.1).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from data_quality_ray.stages.decision import decision_batch
from data_quality_ray.stages.langid import langid_batch
from data_quality_ray.stages.perplexity import ppl_batch
from data_quality_ray.stages.rules import rules_batch
from data_quality_ray.stages.scrub import scrub_batch
from data_quality_ray.stages.split import split_batch
from data_quality_ray.stages.decode import decode_features


def annotate_table(table: pa.Table) -> pa.Table:
    """Sequential annotate: same kernels, one process, one batch."""
    t = decode_features(table)
    t = t.drop_columns(["bytes"])
    t = scrub_batch(t)
    t = langid_batch(t)
    t = ppl_batch(t)
    t = rules_batch(t)
    t = decision_batch(t)
    t = split_batch(t)
    return t


def lang_stats_table(annotated: pa.Table) -> pd.DataFrame:
    """Per-(lang, split) stats, sequential (reference: runme.py:17-36 role)."""
    df = annotated.select(["lang", "split", "keep", "ppl", "quality_score"]).to_pandas()
    g = (
        df.groupby(["lang", "split"], sort=True)
        .agg(
            n_clips=("keep", "size"),
            n_kept=("keep", "sum"),
            mean_ppl=("ppl", "mean"),
            mean_score=("quality_score", "mean"),
        )
        .reset_index()
    )
    g["n_kept"] = g["n_kept"].astype(np.int64)
    return g


def bucket_counts_dict(annotated: pa.Table) -> dict[str, int]:
    """{Good, Mid, Bad} counts (runme.py:35-36's quality_stats.json role)."""
    vc = pd.Series(annotated["bucket"].to_pylist()).value_counts()
    return {
        "Good": int(vc.get("good", 0)),
        "Mid": int(vc.get("mid", 0)),
        "Bad": int(vc.get("bad", 0)),
    }
