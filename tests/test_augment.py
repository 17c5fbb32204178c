"""Corpus-building transforms: utterance materialization + speed perturb."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from data_quality_ray.functions import codecs
from data_quality_ray.stages import augment

SR = 16_000


@pytest.fixture(scope="module")
def _ray(ray_session):
    return ray_session


def _two_burst_clip() -> np.ndarray:
    """0.5 s tone, 0.3 s silence, 0.5 s tone — two clear utterances."""
    t = np.arange(SR // 2) / SR
    tone = (0.45 * np.sin(2 * np.pi * 220.0 * t)).astype(np.float32)
    gap = np.zeros(int(0.3 * SR), dtype=np.float32)
    return np.concatenate([tone, gap, tone * 0.8])


def _write(path, pcms):
    rows = {
        "clip_id": [f"clip-{i:09d}" for i in range(len(pcms))],
        "bytes": [
            codecs.encode(
                np.clip(np.round(p * 32767.0), -32768, 32767).astype(np.int16),
                "pcm16",
                SR,
            )
            for p in pcms
        ],
        "sr_hz": [SR] * len(pcms),
        "dur_ms": [int(1000 * len(p) / SR) for p in pcms],
        "codec": ["pcm16"] * len(pcms),
        "transcript": [""] * len(pcms),
    }
    pq.write_table(pa.table(rows), path)


def test_utterance_clips_materializes_segments(_ray, tmp_path):
    _write(tmp_path / "clips.parquet", [_two_burst_clip()])
    out = augment.utterance_clips(str(tmp_path)).to_pandas().sort_values("clip_id")
    assert list(out["clip_id"]) == ["clip-000000000-u0", "clip-000000000-u1"]
    # each utterance ≈ 0.5 s (VAD 20 ms frame granularity) and is speech,
    # not the silence between bursts
    for _, row in out.iterrows():
        assert 400 <= row["dur_ms"] <= 620
        pcm = codecs.decode_tolerant(row["bytes"], row["codec"], SR)
        assert float(np.sqrt((pcm**2).mean())) > 0.1
    # schema is a drop-in clip table (minus transcript)
    assert list(out.columns) == ["clip_id", "bytes", "sr_hz", "dur_ms", "codec"]


def test_speed_perturb_scales_duration(_ray, tmp_path):
    t = np.arange(2 * SR) / SR
    _write(tmp_path / "clips.parquet", [(0.4 * np.sin(2 * np.pi * 180.0 * t)).astype(np.float32)])
    out = augment.speed_perturb_clips(str(tmp_path), factors=(0.9, 1.0, 1.1)).to_pandas()
    # identity factor skipped → two derived rows
    assert sorted(out["clip_id"]) == ["clip-000000000-sp110", "clip-000000000-sp90"]
    d = dict(zip(out["clip_id"], out["dur_ms"]))
    assert abs(d["clip-000000000-sp90"] - 2000 / 0.9) < 5
    assert abs(d["clip-000000000-sp110"] - 2000 / 1.1) < 5
    # payloads decode at the nominal rate
    for _, row in out.iterrows():
        pcm = codecs.decode_tolerant(row["bytes"], row["codec"], SR)
        assert abs(len(pcm) / SR * 1000 - row["dur_ms"]) <= 1
