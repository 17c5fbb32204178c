"""Deterministic train/test split stage.

Replaces the reference's unseeded Bernoulli splits (eeg_datasets.py:45,
91-96 per-window; :160,183 per-file) with a content-keyed md5 split
(functions/hashing.py) that is location- and order-independent, and
reproducible in the DuckDB oracle:

    split = 'test' iff substr(md5(clip_id),1,1) ∈ {'0','1','2','3'}   (P=0.25)

Group-grain splits (the reference's per-file grain, O2) are expressed by
hashing the group key instead of the row key.
"""

from __future__ import annotations

import pyarrow as pa

from data_quality_ray.functions.hashing import split_column


def split_batch(batch: pa.Table, key: str = "clip_id") -> pa.Table:
    return batch.append_column("split", split_column(batch[key]))
