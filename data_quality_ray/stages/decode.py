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

CANONICAL_SR = 16_000  # M6 analogue: the reference resamples every record to
                       # one canonical rate before featurization
                       # (eeg_features.py:87-88 resamples to 300 Hz)
_NOTCH_HZ = (50.0, 60.0)  # M7 analogue: mains-hum removal
                          # (eeg_features.py:89 notch at 60/120 Hz)
# M8 analogue: named frequency bands; the LAST band is the "badness" band
# the reference keeps (eeg_features.py:49-56 keeps only the [30,60) "bad"
# band per channel)
_BANDS_HZ = ((0, 250), (250, 500), (500, 1000), (1000, 2000), (2000, 4000), (4000, 8000))


def _resample_linear(pcm: np.ndarray, sr_from: int, sr_to: int) -> np.ndarray:
    """Linear-interpolation resample (vectorized np.interp)."""
    if sr_from == sr_to:
        return pcm.astype(np.float64)
    n_out = int(round(len(pcm) * sr_to / sr_from))
    x_out = np.arange(n_out, dtype=np.float64) * (sr_from / sr_to)
    return np.interp(x_out, np.arange(len(pcm), dtype=np.float64), pcm.astype(np.float64))


def decode_features(batch: pa.Table, *, drop_payload: bool = False) -> pa.Table:
    """Tolerant decode + per-clip audio featurization.

    Per clip: decode (None → decode_ok=False, the measure.py:23 ``-1``
    short-circuit) → resample to CANONICAL_SR (M6) → FFT-domain notch of
    mains-hum bins (M7) → normalized band powers over _BANDS_HZ with the
    top band kept as ``hf_ratio`` (M8's "bad"-band role) + rms/peak.

    ``drop_payload=True`` drops the heavy ``bytes`` column in the same
    stage, so the wide binary data never crosses another operator boundary
    (SURVEY.md §7.4 "wide binary rows").
    """
    n = batch.num_rows
    bufs = batch["bytes"].to_pylist()
    srs = batch["sr_hz"].to_numpy()
    cods = batch["codec"].to_pylist()

    ok = np.zeros(n, dtype=bool)
    ns = np.zeros(n, dtype=np.int32)
    rms = np.full(n, -120.0, dtype=np.float32)
    peak = np.zeros(n, dtype=np.float32)
    hf = np.zeros(n, dtype=np.float32)
    band_cols = np.zeros((n, len(_BANDS_HZ)), dtype=np.float32)
    band_edges = np.array([b[0] for b in _BANDS_HZ] + [_BANDS_HZ[-1][1]], dtype=np.float64)
    notch_edges = np.array(
        [[h - 2.0, h + 2.0] for f0 in _NOTCH_HZ for h in (f0, 2 * f0)], dtype=np.float64
    )
    # NOTE on vectorization: batching the rfft over padded same-length
    # matrices was MEASURED and rejected — clip lengths are ~all distinct
    # (693/1000 unique) and already FFT-smooth (multiples of 16), so
    # pow-2-bucketed padded batch rfft ran 3× SLOWER (2.35 s vs 0.79 s per
    # 933 clips) than the native-length per-clip transform. The win here is
    # the band/notch extraction: one cumsum + searchsorted on bin indices
    # replaces 10 boolean-mask passes over the spectrum per clip.
    for i in range(n):
        pcm = codecs.decode_tolerant(bufs[i], cods[i], int(srs[i]))
        if pcm is None:
            continue
        ok[i] = True
        ns[i] = len(pcm)  # n_samples at the ORIGINAL rate (dur-rule input)
        x = _resample_linear(pcm, int(srs[i]), CANONICAL_SR)
        p = float(np.mean(x * x))
        rms[i] = 10.0 * np.log10(p) if p > 0 else -120.0
        peak[i] = float(np.max(np.abs(x)))
        # float32 transform (native pocketfft path, ~20% faster on these
        # lengths); energies accumulate in float64 from the first multiply
        spec = np.fft.rfft(x.astype(np.float32))
        e = (spec.real.astype(np.float64) ** 2) + (spec.imag.astype(np.float64) ** 2)
        # bin k sits at freq k·sr/len(x); all band/notch ranges become
        # half-open index ranges on the cumulative energy
        scale = len(x) / float(CANONICAL_SR)
        ce = np.concatenate(([0.0], np.cumsum(e)))
        # notch: drop ±2 Hz around each mains frequency and its 2nd
        # harmonic ([lo, hi] CLOSED interval, as the original mask)
        n_lo = np.ceil(notch_edges[:, 0] * scale).astype(np.int64)
        n_hi = np.floor(notch_edges[:, 1] * scale).astype(np.int64) + 1
        n_lo = np.clip(n_lo, 0, len(e))
        n_hi = np.clip(n_hi, n_lo, len(e))
        notch_sums = ce[n_hi] - ce[n_lo]
        b_lo = np.ceil(band_edges * scale).astype(np.int64)
        b_lo = np.clip(b_lo, 0, len(e))
        band_sums = ce[b_lo[1:]] - ce[b_lo[:-1]]
        # every notch range lies inside band 0 ([0, 250)); remove notched
        # energy from that band and the total, matching the zeroed-bin mask
        band_sums[0] -= notch_sums.sum()
        tot = float(ce[-1]) - float(notch_sums.sum())
        if tot > 0:
            band_cols[i, :] = band_sums / tot
            hf[i] = band_cols[i, -1]
    if drop_payload:
        batch = batch.drop_columns(["bytes"])
    out = (
        batch.append_column("decode_ok", pa.array(ok))
        .append_column("n_samples", pa.array(ns, pa.int32()))
        .append_column("rms_db", pa.array(rms, pa.float32()))
        .append_column("peak", pa.array(peak, pa.float32()))
        .append_column("hf_ratio", pa.array(hf, pa.float32()))
    )
    return out.append_column(
        "band_power", pa.array([row.tolist() for row in band_cols], pa.list_(pa.float32()))
    )
