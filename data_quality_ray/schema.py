"""Explicit Arrow schemas + boundary validation.

Replaces the reference's implicit npz contract and its runtime asserts
(runme.py:50, measure.py:32) with a reified ``pa.Schema`` checked once at
the pipeline boundary (SURVEY.md §1.2).
"""

from __future__ import annotations

import pyarrow as pa

CLIP_SCHEMA = pa.schema(
    [
        ("clip_id", pa.string()),
        ("bytes", pa.binary()),
        ("sr_hz", pa.int32()),
        ("dur_ms", pa.int32()),
        ("codec", pa.string()),
        ("transcript", pa.string()),
    ]
)

# columns appended by the pipeline, in stage order
AUDIO_COLS = [
    ("decode_ok", pa.bool_()),
    ("n_samples", pa.int32()),
    ("rms_db", pa.float32()),
    ("peak", pa.float32()),
    ("hf_ratio", pa.float32()),
    ("band_power", pa.list_(pa.float32())),
]
SCRUB_COLS = [
    ("transcript_scrubbed", pa.string()),
    ("had_pii", pa.bool_()),
    ("had_tox", pa.bool_()),
]
LANGID_COLS = [("lang", pa.string()), ("lang_conf", pa.float32())]
PPL_COLS = [("ppl", pa.float64())]
RULE_COLS = [
    ("rep_ratio", pa.float64()),
    ("sym_density", pa.float64()),
    ("len_ratio", pa.float64()),
    ("rule_flags", pa.list_(pa.string())),
]
DECISION_COLS = [
    ("n_defects", pa.int32()),
    ("quality_score", pa.float64()),
    ("keep", pa.bool_()),
    ("bucket", pa.string()),
]

OUTPUT_SCHEMA = pa.schema(
    [f for f in CLIP_SCHEMA if f.name != "bytes"]
    + [pa.field(n, t) for n, t in AUDIO_COLS + SCRUB_COLS + LANGID_COLS + PPL_COLS + RULE_COLS + DECISION_COLS]
    + [pa.field("split", pa.string())]
)


class SchemaError(ValueError):
    pass


def validate_clip_schema(s: pa.Schema) -> None:
    """Boundary check: input schema must carry the clip columns."""
    names = set(s.names)
    for field in CLIP_SCHEMA:
        if field.name not in names:
            raise SchemaError(f"missing input column {field.name!r}")
        have = s.field(field.name).type
        if have != field.type and not (
            pa.types.is_integer(have) and pa.types.is_integer(field.type)
        ):
            raise SchemaError(
                f"column {field.name!r} has type {have}, expected {field.type}"
            )


def validate_clips(table: pa.Table) -> None:
    """Boundary check: input table must carry the clip schema columns."""
    validate_clip_schema(table.schema)
