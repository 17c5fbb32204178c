"""Source/sink seam (SURVEY.md §2.1/§2.2).

Storage-format dispatch behind one function pair so pipelines never name a
format: parquet is the in-sandbox format; Lance is used when importable
(the north rule's table format — not present in this container); csv/json
cover the reference's text sinks (eeg_datasets.py:98-102, 230-237 wrote CSV).
"""

from data_quality_ray.sources.registry import (  # noqa: F401
    read_table,
    write_table,
    SUPPORTED_FORMATS,
)
