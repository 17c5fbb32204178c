"""Tolerant audio decode + audio featurization stage.

Reference analogues: payload normalization/cleaning (eeg_features.py:6-16
transpose, eeg_datasets.py:162-164 nan_to_num) and the spectral featurizer's
high-frequency "badness" bands (eeg_features.py:49-71, AF7HiFreq/AF8HiFreq)
— here per-clip ``hf_ratio`` (upper-half-spectrum energy fraction), plus
rms/peak. Undecodable payloads map to ``decode_ok=False`` (the ``gt == -1``
short-circuit of measure.py:23) instead of raising.

This stage deliberately does NOT carry the waveform forward: features are
computed here and the heavy ``bytes`` column is dropped by the pipeline right
after (SURVEY.md §7.4 "wide binary rows").
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from data_quality_ray.functions import codecs

_FFT_WINDOW = 8192


def decode_features(batch: pa.Table) -> pa.Table:
    """Append decode_ok, n_samples, rms_db, peak, hf_ratio columns."""
    n = batch.num_rows
    bufs = batch["bytes"].to_pylist()
    srs = batch["sr_hz"].to_numpy()
    cods = batch["codec"].to_pylist()

    ok = np.zeros(n, dtype=bool)
    ns = np.zeros(n, dtype=np.int32)
    rms = np.full(n, -120.0, dtype=np.float32)
    peak = np.zeros(n, dtype=np.float32)
    hf = np.zeros(n, dtype=np.float32)
    for i in range(n):
        pcm = codecs.decode_tolerant(bufs[i], cods[i], int(srs[i]))
        if pcm is None:
            continue
        ok[i] = True
        ns[i] = len(pcm)
        p = float(np.mean(pcm.astype(np.float64) ** 2))
        rms[i] = 10.0 * np.log10(p) if p > 0 else -120.0
        peak[i] = float(np.max(np.abs(pcm)))
        # upper-half-spectrum energy fraction; FFT over a bounded window
        # (first 8192 samples) — the spectral-balance feature needs a
        # representative window, not the whole clip, and this caps per-row
        # cost independent of clip length (same window in the oracle)
        w = pcm[:_FFT_WINDOW].astype(np.float64)
        spec = np.fft.rfft(w)
        e = spec.real * spec.real + spec.imag * spec.imag
        tot = float(e.sum())
        hf[i] = float(e[len(e) // 2 :].sum() / tot) if tot > 0 else 0.0
    return (
        batch.append_column("decode_ok", pa.array(ok))
        .append_column("n_samples", pa.array(ns, pa.int32()))
        .append_column("rms_db", pa.array(rms, pa.float32()))
        .append_column("peak", pa.array(peak, pa.float32()))
        .append_column("hf_ratio", pa.array(hf, pa.float32()))
    )
