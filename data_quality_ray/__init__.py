"""data_quality_ray — a Ray-Data-native data-quality / quality-filter engine.

A from-scratch reimplementation of the keep/drop data-valuation semantics of
the reference repo ``data-eng/data_quality`` (see SURVEY.md), lifted to a
streaming Ray Data DAG over tables of audio-clip + transcript pairs:

    read → decode (tolerant) → langid (actor pool) → perplexity (actor pool)
         → heuristic rules → PII/toxicity scrub → score/keep/bucket decision
         → [stats groupby ∥ write_parquet with per-partition lineage]

Everything here derives from public knowledge only: the Ray Data / pyarrow
public APIs and the reference's observable semantics. No code is copied from
the reference (which is a sequential numpy/mne research script — see
SURVEY.md §4); only its computed semantics are re-expressed Ray-Data-first.

Layout:
  functions/  pure vectorized kernels (codecs, text, hashing)
  synth/      deterministic synthetic clip-table generator (FIXTURES.md §2)
  stages/     pipeline stages: pa.Table -> pa.Table fns and actor classes
  pipelines/  composed pipelines (quality filter, relational conformance)
  state/      checkpoint / resume manifest
  oracle.py   single-process oracle (reference-role stand-in) for the F1 gate
"""

__version__ = "0.1.0"
