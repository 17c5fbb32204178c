"""Language-ID stage — stateful actor pool.

The fastText-style hashed char-trigram NB model (functions/models.py) is
built ONCE per actor in ``__init__`` (T1 pattern: the reference builds its
mne info object once and reuses it across the record loop,
eeg_features.py:82-87) and applied per batch as a numpy gather — no per-row
python in the scoring inner loop beyond row slicing.

Usage: ``ds.map_batches(LangIdStage, batch_format="pyarrow",
batch_size=TEXT_BATCH_SIZE, concurrency=LANGID_CONCURRENCY)``.
"""

from __future__ import annotations

import pyarrow as pa

from data_quality_ray.functions.models import get_langid_model, langid_scores


class LangIdStage:
    def __init__(self, column: str = "transcript_scrubbed") -> None:
        self.column = column
        self.model = get_langid_model()  # trained/cached once per worker

    def __call__(self, batch: pa.Table) -> pa.Table:
        lang, conf, _mlp = langid_scores(batch[self.column])
        return batch.append_column("lang", pa.array(lang, pa.string())).append_column(
            "lang_conf", pa.array(conf, pa.float32())
        )


def langid_batch(batch: pa.Table) -> pa.Table:
    """Stateless function form (oracle / tests)."""
    return LangIdStage()(batch)
