"""Audio embedding stage: log-mel energy vector per clip (from scratch).

The role a learned audio encoder plays in a real training-data pipeline
(dedup by content, ANN retrieval, clustering), implemented with public
DSP only: resample → rfft power spectrum → triangular mel filterbank →
log → L2 normalize. Deterministic, codec-invariant (the same underlying
waveform embeds nearly identically through pcm16/wav/ulaw/alaw — tested),
and shaped exactly like the ``embeddings`` table (list<float32>), so the
embedding ops (pipelines/embeddings.py) apply to clips unchanged.

Stateful actor stage: the filterbank matrix is built once per worker.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from data_quality_ray.functions import codecs
from data_quality_ray.stages.decode import CANONICAL_SR, _resample_linear

N_MELS = 26
N_FFT_BINS = 1 + 4096 // 2  # power spectrum of a 4096-sample window
_HANN_4096 = np.hanning(4096)  # window is a constant; never rebuild per frame


def _hz_to_mel(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def _mel_to_hz(m):
    return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)


def mel_filterbank(n_mels: int = N_MELS, sr: int = CANONICAL_SR, n_fft: int = 4096) -> np.ndarray:
    """(n_mels, n_fft//2+1) triangular filterbank (standard public recipe)."""
    n_bins = 1 + n_fft // 2
    mel_pts = np.linspace(_hz_to_mel(0.0), _hz_to_mel(sr / 2.0), n_mels + 2)
    hz_pts = _mel_to_hz(mel_pts)
    bins = np.floor((n_fft + 1) * hz_pts / sr).astype(int).clip(0, n_bins - 1)
    fb = np.zeros((n_mels, n_bins))
    for m in range(1, n_mels + 1):
        lo, ctr, hi = bins[m - 1], bins[m], bins[m + 1]
        if ctr > lo:
            fb[m - 1, lo:ctr] = (np.arange(lo, ctr) - lo) / (ctr - lo)
        if hi > ctr:
            fb[m - 1, ctr:hi] = (hi - np.arange(ctr, hi)) / (hi - ctr)
    return fb


def embed_pcm(pcm: np.ndarray, sr_hz: int, fb: np.ndarray) -> np.ndarray:
    """float PCM → L2-normalized log-mel vector (N_MELS float32)."""
    x = _resample_linear(pcm, sr_hz, CANONICAL_SR)
    n_fft = 4096
    # average the power spectra of successive non-overlapping windows —
    # frames are FIXED length, so this is the case where a batched 2-D
    # rfft genuinely applies (one transform per clip, no per-frame loop)
    n_frames = max(1, len(x) // n_fft)
    if len(x) < n_fft:
        frames = np.zeros((1, n_fft))
        frames[0, : len(x)] = x
    else:
        frames = x[: n_frames * n_fft].reshape(n_frames, n_fft)
    spec = np.fft.rfft(frames * _HANN_4096[None, :], axis=1)
    acc = (spec.real**2 + spec.imag**2).sum(axis=0)
    mel = fb @ (acc / n_frames)
    # energy-relative floor (−40 dB re total): bands below any codec's
    # quantization noise floor (G.711 ≈ −37 dB SNR) clamp identically, so
    # the embedding is codec-invariant
    floor = 1e-4 * max(float(mel.sum()), 1e-30)
    v = np.log(np.maximum(mel, floor))
    v -= v.mean()
    n = np.linalg.norm(v)
    return (v / n if n > 0 else v).astype(np.float32)


class AudioEmbedStage:
    """Actor-pool stage: (clip_id, bytes, sr_hz, codec) → embedding column."""

    def __init__(self) -> None:
        self.fb = mel_filterbank()  # built once per worker

    def __call__(self, batch: pa.Table) -> pa.Table:
        bufs = batch["bytes"].to_pylist()
        srs = batch["sr_hz"].to_numpy()
        cods = batch["codec"].to_pylist()
        out: list[list[float]] = []
        ok = np.zeros(batch.num_rows, dtype=bool)
        for i in range(batch.num_rows):
            pcm = codecs.decode_tolerant(bufs[i], cods[i], int(srs[i]))
            if pcm is None:
                out.append([])
                continue
            ok[i] = True
            out.append(embed_pcm(pcm, int(srs[i]), self.fb).tolist())
        return pa.table(
            {
                "clip_id": batch["clip_id"],
                "decode_ok": pa.array(ok),
                "embedding": pa.array(out, pa.list_(pa.float32())),
            }
        )


def clip_audio_embeddings(clips_dir: str) -> "object":
    """Dataset of (clip_id, decode_ok, embedding) over a clip table."""
    import ray.data as rd

    from data_quality_ray import config

    return rd.read_parquet(
        clips_dir, columns=["clip_id", "bytes", "sr_hz", "codec"]
    ).map_batches(
        AudioEmbedStage,
        batch_format="pyarrow",
        batch_size=512,
        concurrency=config.actor_pool_bounds(),
    )
