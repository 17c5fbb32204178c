"""Deterministic synthetic clip-table generation (FIXTURES.md §2).

No external data: transcripts come from small built-in per-language word
corpora, audio is seeded sum-of-sines + noise PCM. Everything is a pure
function of (seed, row index), so any scale factor regenerates identically
on any machine / any cluster size.
"""

from data_quality_ray.synth.clips import (  # noqa: F401
    CLIP_SF_ROWS,
    clips_path,
    ensure_clips,
    generate_clips,
)
