"""Loudness stats + peak normalization: exact kernel values, e2e plumbing."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from data_quality_ray.functions import codecs
from data_quality_ray.stages import loudness

SR = 16_000


@pytest.fixture(scope="module")
def _ray(ray_session):
    return ray_session


def test_loudness_of_sine_exact():
    t = np.arange(SR) / SR
    x = 0.5 * np.sin(2 * np.pi * 100.0 * t)  # 160 full periods — exact RMS
    s = loudness.loudness_of(x)
    assert s["peak_db_e2"] == int(round(20 * np.log10(0.5) * 100))  # −6.02 dB
    # sine RMS = peak/√2 → crest ≈ 1.414
    assert abs(s["crest_e3"] - 1414) <= 1
    assert s["n_clipped"] == 0
    assert s["n_samples"] == SR


def test_loudness_of_silence_and_clipping():
    s = loudness.loudness_of(np.zeros(100))
    assert s["peak_db_e2"] == loudness.SILENCE_DB_E2
    assert s["rms_db_e2"] == loudness.SILENCE_DB_E2
    assert s["crest_e3"] == 0
    hot = np.clip(2.0 * np.sin(2 * np.pi * 50.0 * np.arange(SR) / SR), -0.999, 0.999)
    s = loudness.loudness_of(hot)
    assert s["n_clipped"] > 0.2 * SR  # hard-clipped half-waves
    assert s["peak_db_e2"] == int(round(20 * np.log10(0.999) * 100))


def _write_clips(path, pcms):
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


def test_clip_loudness_stats_dataset(_ray, tmp_path):
    t = np.arange(SR) / SR
    _write_clips(
        tmp_path / "clips.parquet",
        [0.25 * np.sin(2 * np.pi * 200 * t), np.zeros(SR // 2)],
    )
    out = (
        loudness.clip_loudness_stats(str(tmp_path))
        .to_pandas()
        .sort_values("clip_id")
        .reset_index(drop=True)
    )
    assert list(out["n_samples"]) == [SR, SR // 2]
    assert out["peak_db_e2"][1] == loudness.SILENCE_DB_E2
    # 0.25 encoded via pcm16 → peak within one quantization step of −12 dB
    assert abs(out["peak_db_e2"][0] - int(round(20 * np.log10(0.25) * 100))) <= 2


def test_normalize_clips_hits_target_peak(_ray, tmp_path):
    t = np.arange(SR) / SR
    _write_clips(
        tmp_path / "clips.parquet",
        [0.05 * np.sin(2 * np.pi * 150 * t), 0.9 * np.sin(2 * np.pi * 90 * t), np.zeros(SR // 4)],
    )
    out = loudness.normalize_clips(str(tmp_path)).to_pandas().sort_values("clip_id")
    for _, row in out.iterrows():
        pcm = codecs.decode_tolerant(row["bytes"], row["codec"], SR)
        peak = float(np.abs(pcm).max())
        if row["gain_db_e2"] == 0 and peak == 0.0:
            continue  # silent clip passed through
        assert abs(peak - loudness.NORM_TARGET_PEAK) < 2e-3
    # quiet clip boosted (~+20 dB), hot clip attenuated (~−2 dB)
    gains = sorted(out["gain_db_e2"])
    assert gains[0] < 0 < gains[-1]
    assert out.loc[out["clip_id"] == "clip-000000000", "gain_db_e2"].iloc[0] > 1500
