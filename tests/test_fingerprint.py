"""Constellation fingerprinting: kernel invariances + planted-copy matching."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from data_quality_ray.functions import codecs
from data_quality_ray.pipelines.dedup import DUP_OFFSET
from data_quality_ray.stages import fingerprint as fp

SR = 16_000


@pytest.fixture(scope="module")
def _ray(ray_session):
    return ray_session


def _tone_pcm(f0: float, n_sec: float = 3.0, seed: int = 0) -> np.ndarray:
    """Two-tone + seeded noise clip, same recipe shape as the synth table."""
    rng = np.random.default_rng(seed)
    t = np.arange(int(n_sec * SR)) / SR
    sig = (
        0.45 * np.sin(2 * np.pi * f0 * t)
        + 0.18 * np.sin(2 * np.pi * 2.1 * f0 * t)
        + 0.05 * rng.standard_normal(len(t))
    )
    return np.clip(sig, -0.999, 0.999).astype(np.float32)


def test_fingerprint_deterministic_and_gain_invariant():
    x = _tone_pcm(180.0)
    h1, t1 = fp.fingerprint_pcm(x, SR)
    h2, t2 = fp.fingerprint_pcm(0.25 * x, SR)
    assert len(h1) > 500  # noise-floor peaks admitted (margin calibration)
    assert np.array_equal(h1, h2) and np.array_equal(t1, t2)
    # sorted unique hashes → byte-stable signature
    assert np.all(np.diff(h1.astype(np.int64)) > 0)


def test_fingerprint_shift_moves_times_not_hashes():
    """Prepending s hops of silence shifts each shared hash's first
    occurrence by s (±1 frame of window-boundary ambiguity)."""
    s = 8
    x = _tone_pcm(140.0)
    y = np.concatenate([np.zeros(s * fp.FP_HOP, dtype=x.dtype), x])
    h1, t1 = fp.fingerprint_pcm(x, SR)
    h2, t2 = fp.fingerprint_pcm(y, SR)
    common, i1, i2 = np.intersect1d(h1, h2, return_indices=True)
    assert len(common) >= 0.8 * len(h1)
    dt = t2[i2] - t1[i1]
    aligned = np.isin(dt, (s - 1, s)).mean()
    assert aligned >= 0.9, f"only {aligned:.0%} of shared hashes aligned"


def test_fingerprint_survives_g711_transcode():
    x = _tone_pcm(220.0)
    pcm16 = np.clip(np.round(x * 32767.0), -32768, 32767).astype(np.int16)
    y = codecs.decode_tolerant(codecs.encode(pcm16, "ulaw", SR), "ulaw", SR)
    h1, t1 = fp.fingerprint_pcm(x, SR)
    h2, t2 = fp.fingerprint_pcm(y, SR)
    common, i1, i2 = np.intersect1d(h1, h2, return_indices=True)
    assert len(common) >= 0.6 * len(h1)
    assert (t2[i2] == t1[i1]).mean() >= 0.95  # no shift → dt 0


def test_fingerprint_separates_distinct_content():
    """Well-separated tones (≥ 3 FFT bins apart) share only scattered
    coincidence hashes — no single alignment offset accumulates votes."""
    h1, t1 = fp.fingerprint_pcm(_tone_pcm(120.0, seed=1), SR)
    h2, t2 = fp.fingerprint_pcm(_tone_pcm(300.0, seed=2), SR)
    common, i1, i2 = np.intersect1d(h1, h2, return_indices=True)
    assert len(common) < 0.15 * len(h1)
    if len(common):
        dt = t2[i2] - t1[i1]
        _, cnts = np.unique(dt, return_counts=True)
        assert cnts.max() < 100


def test_clip_fingerprint_matches_recovers_planted_offsets(_ray, tmp_path):
    """E2E: every planted (transcoded + silence-shifted) copy must match its
    source at the planted frame offset; well-separated sources must not
    cross-match."""
    import pyarrow as pa

    from data_quality_ray.pipelines.multimodal_dedup import clip_fingerprint_matches

    n = 12
    rows = {
        "clip_id": [f"clip-{i:09d}" for i in range(n)],
        "bytes": [],
        "sr_hz": [SR] * n,
        "dur_ms": [3000] * n,
        "codec": ["pcm16"] * n,
        "transcript": [""] * n,
    }
    for i in range(n):
        x = _tone_pcm(100.0 + 60.0 * i, seed=100 + i)  # ≥ 3.8 bins apart
        pcm16 = np.clip(np.round(x * 32767.0), -32768, 32767).astype(np.int16)
        rows["bytes"].append(codecs.encode(pcm16, "pcm16", SR))
    pq.write_table(pa.table(rows), tmp_path / "clips.parquet")

    shift = 8
    out = clip_fingerprint_matches(str(tmp_path), limit=n, shift_frames=shift)
    planted = out[(out["b"] - out["a"]) == DUP_OFFSET]
    assert len(planted) == n, f"planted matches missing: {out}"
    # recovered alignment = planted shift (±1 window-boundary frame)
    assert planted["dt_frames"].isin([shift - 1, shift]).all()
    assert (planted["votes"] >= 200).all()
    others = out[(out["b"] - out["a"]) != DUP_OFFSET]
    assert len(others) == 0, f"spurious cross matches: {others}"
