"""Score / keep / bucket decision stage — the valuation kernel.

Re-expresses the reference's inter-annotator-agreement scoring
(measure.py:3-33) as defect counting over this pipeline's signals:

  reference                          graft
  -------------------------------   ------------------------------------
  gt == -1        → score 0.0       decode failed        → score 0.0
  sq-err == 0     → score 1.0       0 defects            → score 1.0
  sq-err == 1     → score 0.5       1 defect             → score 0.5
  sq-err >= 2     → score 0.2       ≥2 defects           → score 0.2

  keep class = (score == 1.0)       (eeg_datasets.py:65)
  bucket: >0.75 good, <0.25 bad, else mid   (runme.py:29-31)

Defects: rule flags (rep/sym/len/dur) + "lang" (low langid confidence) +
"ppl" (high perplexity) + "tox" (toxicity matched by the scrubber). PII is
NOT a defect — the scrub repairs it (clean_data role).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from data_quality_ray import config


def decision_batch(batch: pa.Table) -> pa.Table:
    n = batch.num_rows
    decode_ok = batch["decode_ok"].to_numpy(zero_copy_only=False)
    lang_conf = batch["lang_conf"].to_numpy().astype(np.float64)
    ppl = batch["ppl"].to_numpy()
    had_tox = batch["had_tox"].to_numpy(zero_copy_only=False)
    n_rule_flags = np.asarray(
        [len(f) for f in batch["rule_flags"].to_pylist()], dtype=np.int64
    )

    defects = (
        n_rule_flags
        + (lang_conf < config.LANG_CONF_MIN).astype(np.int64)
        + (ppl > config.PPL_MAX).astype(np.int64)
        + had_tox.astype(np.int64)
    )
    score = np.where(
        ~decode_ok,
        config.SCORE_INVALID,
        np.where(
            defects == 0,
            config.SCORE_PERFECT,
            np.where(defects == 1, config.SCORE_ONE_DEFECT, config.SCORE_MANY_DEFECTS),
        ),
    )
    keep = score == config.SCORE_PERFECT
    bucket = np.where(
        score > config.BUCKET_GOOD_MIN,
        "good",
        np.where(score < config.BUCKET_BAD_MAX, "bad", "mid"),
    )
    return (
        batch.append_column("n_defects", pa.array(defects.astype(np.int32), pa.int32()))
        .append_column("quality_score", pa.array(score, pa.float64()))
        .append_column("keep", pa.array(keep))
        .append_column("bucket", pa.array(bucket, pa.string()))
    )
