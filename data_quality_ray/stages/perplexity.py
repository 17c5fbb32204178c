"""Perplexity stage — stateful actor pool.

KenLM-style interpolated char bigram/trigram LM (functions/models.py), built
once per actor in ``__init__`` (T1 pattern). The perplexity plays the
normalized spectral-"badness" role of the reference's PSD band features
(eeg_features.py:49-71): a relative, normalized per-record score feeding the
keep/drop decision.
"""

from __future__ import annotations

import pyarrow as pa

from data_quality_ray.functions.models import get_lm, ppl_scores


class PerplexityStage:
    def __init__(self, column: str = "transcript_scrubbed") -> None:
        self.column = column
        self.lm = get_lm()  # trained/cached once per worker

    def __call__(self, batch: pa.Table) -> pa.Table:
        ppl = ppl_scores(batch[self.column])
        return batch.append_column("ppl", pa.array(ppl, pa.float64()))


def ppl_batch(batch: pa.Table) -> pa.Table:
    """Stateless function form (oracle / tests)."""
    return PerplexityStage()(batch)
