"""MFCC featurizer stage: the standard speech feature front-end, from
scratch with public DSP only (pre-emphasis → 25 ms/10 ms framed Hann STFT →
triangular mel filterbank → log → orthonormal DCT-II → first 13 cepstra).

Complements stages/audio_embed.py (whole-clip log-mel vector for dedup/ANN):
MFCCs are the *per-frame* time-frequency features a speech model trains on;
the stage summarizes each clip as per-coefficient mean and std so the output
stays one fixed-width row per clip (list<float32> ×2), ready for the same
embedding machinery or a downstream trainer.

Stateful actor stage: filterbank + DCT basis built once per worker in
``__init__``. Framing is a zero-copy stride view; the rfft is ONE batched
2-D transform per clip — frames are fixed-length, which is exactly the case
where batched rfft wins (see memory: padded batching loses only for
distinct-length whole clips).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from data_quality_ray.functions import codecs
from data_quality_ray.stages.audio_embed import mel_filterbank
from data_quality_ray.stages.decode import CANONICAL_SR, _resample_linear

N_MFCC = 13
N_MELS = 40
FRAME = 400  # 25 ms @ 16 kHz
HOP = 160  # 10 ms
N_FFT = 512
PREEMPH = 0.97
_HANN = np.hanning(FRAME)


def dct_ii_orthonormal(k: int, n: int) -> np.ndarray:
    """(k, n) orthonormal DCT-II basis (SciPy's ``dct(norm='ortho')``)."""
    grid = np.pi * np.arange(k)[:, None] * (2 * np.arange(n)[None, :] + 1) / (2 * n)
    basis = np.sqrt(2.0 / n) * np.cos(grid)
    basis[0] /= np.sqrt(2.0)
    return basis


def mfcc_frames(pcm: np.ndarray, sr_hz: int, fb: np.ndarray, dct: np.ndarray) -> np.ndarray:
    """float PCM → (n_frames, N_MFCC) MFCC matrix."""
    x = _resample_linear(pcm, sr_hz, CANONICAL_SR).astype(np.float64)
    x = np.concatenate(([x[0]], x[1:] - PREEMPH * x[:-1])) if len(x) > 1 else x
    if len(x) < FRAME:
        x = np.pad(x, (0, FRAME - len(x)))
    n_frames = 1 + (len(x) - FRAME) // HOP
    frames = np.lib.stride_tricks.as_strided(
        x,
        shape=(n_frames, FRAME),
        strides=(x.strides[0] * HOP, x.strides[0]),
        writeable=False,
    )
    spec = np.fft.rfft(frames * _HANN[None, :], n=N_FFT, axis=1)
    power = spec.real**2 + spec.imag**2
    mel = power @ fb.T
    logmel = np.log(np.maximum(mel, 1e-10))
    return logmel @ dct.T


class MfccStage:
    """Actor-pool stage: (clip_id, bytes, sr_hz, codec) → per-clip MFCC
    mean/std vectors (each ``list<float32>`` of length N_MFCC)."""

    def __init__(self) -> None:
        self.fb = mel_filterbank(n_mels=N_MELS, sr=CANONICAL_SR, n_fft=N_FFT)
        self.dct = dct_ii_orthonormal(N_MFCC, N_MELS)

    def __call__(self, batch: pa.Table) -> pa.Table:
        bufs = batch["bytes"].to_pylist()
        srs = batch["sr_hz"].to_numpy()
        cods = batch["codec"].to_pylist()
        mean_out: list[list[float]] = []
        std_out: list[list[float]] = []
        ok = np.zeros(batch.num_rows, dtype=bool)
        for i in range(batch.num_rows):
            pcm = codecs.decode_tolerant(bufs[i], cods[i], int(srs[i]))
            if pcm is None:
                mean_out.append([])
                std_out.append([])
                continue
            ok[i] = True
            m = mfcc_frames(pcm, int(srs[i]), self.fb, self.dct)
            mean_out.append(m.mean(axis=0).astype(np.float32).tolist())
            std_out.append(m.std(axis=0).astype(np.float32).tolist())
        return pa.table(
            {
                "clip_id": batch["clip_id"],
                "decode_ok": pa.array(ok),
                "mfcc_mean": pa.array(mean_out, pa.list_(pa.float32())),
                "mfcc_std": pa.array(std_out, pa.list_(pa.float32())),
            }
        )


def clip_mfcc_features(clips_dir: str) -> "object":
    """Dataset of (clip_id, decode_ok, mfcc_mean, mfcc_std) over a clip table."""
    import ray.data as rd

    from data_quality_ray import config

    return rd.read_parquet(
        clips_dir, columns=["clip_id", "bytes", "sr_hz", "codec"]
    ).map_batches(
        MfccStage,
        batch_format="pyarrow",
        batch_size=512,
        concurrency=config.actor_pool_bounds(),
    )
