"""Spectral-peak constellation fingerprinting for audio clips.

The landmark-hash scheme from Wang's "An Industrial-Strength Audio Search
Algorithm" (ISMIR 2003, public): pick spectrogram peaks, pair each anchor
peak with peaks a fixed frame-offset ahead, and hash (f_anchor, f_target,
dt) into a compact integer. Two recordings of the SAME content share many
hashes at a CONSISTENT time offset; unrelated audio shares only scattered
ones. Unlike the log-mel embedding (stages/audio_embed.py) this is an
exact-content match signal — robust to codec transcoding, gain changes and
leading silence, and it reports the alignment offset.

Everything is vectorized numpy over one clip's spectrogram:
  - STFT: 1024-sample Hann frames, hop 512, at the 16 kHz canonical rate
  - peaks: per-frame local maxima along frequency, above the frame's mean
    log-magnitude + a margin, top-3 by magnitude (gain-invariant: a gain
    shifts log-magnitude uniformly, so both the local-max structure and
    the mean-relative threshold are unchanged)
  - landmarks: anchor-frame peaks × target-frame peaks at frame offsets
    FP_TARGET_DTS; hash = f1<<14 | f2<<4 | dt_index (24 bits)
  - per clip, each hash keeps its FIRST frame index only. That is the
    deliberate scale choice (Wang keeps all occurrences): on stationary
    content the same landmark repeats every frame, and first-occurrence
    dedup keeps the exploded row count proportional to DISTINCT landmarks
    while preserving offset voting — a copy shifted by s frames sees every
    shared hash's first occurrence shifted by exactly s.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from data_quality_ray.functions import codecs
from data_quality_ray.stages.decode import CANONICAL_SR, _resample_linear

FP_N_FFT = 1024
# shared vote-calibration constants: the matcher (multimodal_dedup.
# clip_fingerprint_matches) and the ingest admit gate (pipelines/
# clip_ingest) MUST use the same values — they are calibration-tested as
# a set (tests/test_fingerprint.py, tests/test_clip_ingest.py)
FP_MIN_VOTES = 100
FP_MAX_HASH_GROUP = 24
FP_HOP = 512
FP_PEAKS_PER_FRAME = 3
FP_TARGET_DTS = (1, 3, 6, 10)  # anchor→target frame offsets (target zone)
# ln units above the frame mean. Calibrated at 1.0 (~4.3 dB): high margins
# keep only the stationary tone bins (~16 distinct landmarks per clip — too
# few for offset voting); 1.0 admits the per-clip noise-floor peaks too
# (~1.6k distinct landmarks on a 3 s clip, ~80% surviving a G.711
# transcode at the EXACT planted offset, vs ≤50 aligned coincidence votes
# between unrelated clips — measured, see clip_fingerprint_matches).
FP_PEAK_MARGIN = 1.0
_HANN = np.hanning(FP_N_FFT)


def _frame(x: np.ndarray) -> np.ndarray:
    """(n_frames, FP_N_FFT) strided view of x (zero-padded to one frame)."""
    if len(x) < FP_N_FFT:
        x = np.pad(x, (0, FP_N_FFT - len(x)))
    n_frames = 1 + (len(x) - FP_N_FFT) // FP_HOP
    return np.lib.stride_tricks.as_strided(
        x,
        shape=(n_frames, FP_N_FFT),
        strides=(x.strides[0] * FP_HOP, x.strides[0]),
        writeable=False,
    )


def _peak_matrix(log_s: np.ndarray) -> np.ndarray:
    """(n_frames, FP_PEAKS_PER_FRAME) peak freq bins per frame, -1 = none.

    A bin is a candidate if it is a strict local maximum along frequency
    and exceeds its frame's mean log-magnitude by FP_PEAK_MARGIN; the top
    FP_PEAKS_PER_FRAME candidates by magnitude are kept.
    """
    n_frames, n_bins = log_s.shape
    cand = np.full_like(log_s, -np.inf)
    inner = slice(1, n_bins - 1)
    is_peak = (log_s[:, inner] > log_s[:, :-2]) & (log_s[:, inner] > log_s[:, 2:])
    thresh = log_s.mean(axis=1, keepdims=True) + FP_PEAK_MARGIN
    is_peak &= log_s[:, inner] > thresh
    cand[:, inner][is_peak] = log_s[:, inner][is_peak]
    k = FP_PEAKS_PER_FRAME
    top = np.argpartition(cand, -k, axis=1)[:, -k:]
    peaks = np.where(np.take_along_axis(cand, top, axis=1) > -np.inf, top, -1)
    return peaks.astype(np.int32)


def fingerprint_pcm(pcm: np.ndarray, sr_hz: int) -> tuple[np.ndarray, np.ndarray]:
    """Float PCM → (hashes uint32, first-occurrence frame times int32).

    Deterministic, gain-invariant; hashes are sorted ascending so equal
    content yields byte-identical arrays.
    """
    x = _resample_linear(np.asarray(pcm, dtype=np.float64), sr_hz, CANONICAL_SR)
    frames = _frame(x) * _HANN
    log_s = np.log(np.abs(np.fft.rfft(frames, axis=1)) + 1e-12)
    peaks = _peak_matrix(log_s)
    n_frames = peaks.shape[0]

    all_h: list[np.ndarray] = []
    all_t: list[np.ndarray] = []
    for dt_idx, dt in enumerate(FP_TARGET_DTS):
        if n_frames <= dt:
            continue
        a = peaks[:-dt]  # (n-dt, k) anchors
        b = peaks[dt:]  # (n-dt, k) targets
        f1 = a[:, :, None]  # (n-dt, k, 1)
        f2 = b[:, None, :]  # (n-dt, 1, k)
        valid = (f1 >= 0) & (f2 >= 0)
        h = (
            (f1.astype(np.uint32) << 14)
            | (f2.astype(np.uint32) << 4)
            | np.uint32(dt_idx)
        )
        t = np.broadcast_to(
            np.arange(n_frames - dt, dtype=np.int32)[:, None, None], h.shape
        )
        all_h.append(h[valid])
        all_t.append(t[valid])
    if not all_h:
        return np.empty(0, np.uint32), np.empty(0, np.int32)
    h = np.concatenate(all_h)
    t = np.concatenate(all_t)
    # first occurrence per hash: stable sort by (hash, t), keep group heads
    order = np.lexsort((t, h))
    h, t = h[order], t[order]
    head = np.ones(len(h), dtype=bool)
    head[1:] = h[1:] != h[:-1]
    return h[head], t[head]


def clip_key(clip_id) -> int:
    """Numeric pair-machinery key for a clip id: ``clip-000123`` → 123.

    Derived ids without a numeric tail (``clip-…-u0`` utterances,
    ``clip-…-sp90`` speed perturbs) key by a stable 62-bit md5 of the
    full id instead of crashing the task — collisions are negligible and
    the key only needs to be a deterministic identity."""
    tail = str(clip_id).rsplit("-", 1)[-1]
    try:
        return int(tail)
    except ValueError:
        import hashlib

        digest = hashlib.md5(str(clip_id).encode()).digest()
        return int.from_bytes(digest[:8], "big") & ((1 << 62) - 1)


def fingerprint_batch(t: pa.Table) -> pa.Table:
    """Clip rows → exploded (clip, hash, t) landmark rows.

    Stateless task stage (pure DSP, no model to load). Undecodable
    payloads contribute no rows. ``clip`` is the numeric clip identity
    (clip-000123 → 123), matching the dedup pair machinery's key type.
    """
    clips: list[np.ndarray] = []
    hashes: list[np.ndarray] = []
    times: list[np.ndarray] = []
    for i in range(t.num_rows):
        pcm = codecs.decode_tolerant(
            t["bytes"][i].as_py(), t["codec"][i].as_py(), int(t["sr_hz"][i].as_py())
        )
        if pcm is None or len(pcm) == 0:
            continue
        h, tt = fingerprint_pcm(pcm, int(t["sr_hz"][i].as_py()))
        if len(h) == 0:
            continue
        num = clip_key(t["clip_id"][i].as_py())
        clips.append(np.full(len(h), num, dtype=np.int64))
        hashes.append(h.astype(np.int64))
        times.append(tt)
    if not clips:
        return pa.table(
            {
                "clip": pa.array([], pa.int64()),
                "hash": pa.array([], pa.int64()),
                "t": pa.array([], pa.int32()),
            }
        )
    return pa.table(
        {
            "clip": pa.array(np.concatenate(clips)),
            "hash": pa.array(np.concatenate(hashes)),
            "t": pa.array(np.concatenate(times)),
        }
    )
