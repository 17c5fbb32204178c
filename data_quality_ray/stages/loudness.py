"""Loudness / dynamics analysis and peak normalization over the clip table.

The level-hygiene ops a speech-training pipeline runs before feature
extraction: (a) per-clip loudness stats — peak, RMS, crest factor and
clipped-sample counting — to flag too-quiet, too-hot or hard-clipped
recordings (the audio analogue of the reference's per-record artifact
counting), and (b) peak normalization, re-encoding each clip's payload at a
target headroom so downstream stages see a consistent level.

Both are pruned streaming TASK stages (numpy-only arithmetic, no model
state, no shuffle). Stats are integer fixed-point (dB·e2, ratio·e3,
counts) per the repo's exact-hash rule for value columns
(pipelines/relational.py). dBFS is relative to full scale 1.0 on float
PCM; silence reports the −120 dB sentinel rather than −inf so the column
stays finite.

Clipping detection counts samples at or beyond 99.9% of full scale —
G.711/pcm16 payloads quantize 1.0 to the codec's max code, so an exact
==1.0 test would undercount hard-clipped material after decode.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from data_quality_ray.functions import codecs

CLIP_LEVEL = 0.999  # |sample| ≥ this counts as clipped (post-decode)
SILENCE_DB_E2 = -12_000  # −120.00 dB sentinel for all-zero payloads
NORM_TARGET_PEAK = 0.70795  # −3 dBFS ≈ 10^(−3/20): standard headroom


def loudness_of(pcm: np.ndarray) -> dict:
    """One clip's level stats — pure kernel, test seam."""
    x = np.abs(np.asarray(pcm, dtype=np.float64))
    peak = float(x.max()) if len(x) else 0.0
    rms = float(np.sqrt((x**2).mean())) if len(x) else 0.0
    peak_db = 20.0 * np.log10(peak) if peak > 0 else None
    rms_db = 20.0 * np.log10(rms) if rms > 0 else None
    return {
        "peak_db_e2": int(round(peak_db * 100)) if peak_db is not None else SILENCE_DB_E2,
        "rms_db_e2": int(round(rms_db * 100)) if rms_db is not None else SILENCE_DB_E2,
        # crest factor peak/rms — dynamics indicator (1.0 = square wave,
        # ~1.41 = sine, higher = peaky/speech-like)
        "crest_e3": int(round(peak / rms * 1000)) if rms > 0 else 0,
        "n_clipped": int((x >= CLIP_LEVEL).sum()),
        "n_samples": int(len(x)),
    }


def loudness_batch(t: pa.Table) -> pa.Table:
    ids, cols = [], {k: [] for k in ("peak_db_e2", "rms_db_e2", "crest_e3", "n_clipped", "n_samples")}
    for i in range(t.num_rows):
        pcm = codecs.decode_tolerant(
            t["bytes"][i].as_py(), t["codec"][i].as_py(), int(t["sr_hz"][i].as_py())
        )
        if pcm is None:
            continue
        stats = loudness_of(pcm)
        ids.append(t["clip_id"][i].as_py())
        for k, v in stats.items():
            cols[k].append(v)
    return pa.table(
        {
            "clip_id": pa.array(ids, pa.string()),
            **{k: pa.array(v, pa.int64()) for k, v in cols.items()},
        }
    )


def clip_loudness_stats(clips_dir: str) -> "object":
    """Dataset of per-clip level stats (pruned read, task map, no shuffle)."""
    import ray.data as rd

    return rd.read_parquet(
        clips_dir, columns=["clip_id", "bytes", "sr_hz", "codec"]
    ).map_batches(loudness_batch, batch_format="pyarrow", batch_size=256)


# ---------------------------------------------------------------------------
# Peak normalization: re-encode every decodable clip at −3 dBFS peak
# ---------------------------------------------------------------------------


def normalize_batch(t: pa.Table) -> pa.Table:
    """Gain every clip so its peak hits NORM_TARGET_PEAK, re-encoding with
    the clip's ORIGINAL codec (the payload column stays drop-in
    compatible). All-zero or undecodable payloads pass through unchanged —
    normalization must never destroy rows (the quality gate decides drops,
    not a level fixer). Emits gain_db_e2 for lineage."""
    bufs, gains = [], []
    for i in range(t.num_rows):
        buf = t["bytes"][i].as_py()
        codec = t["codec"][i].as_py()
        sr = int(t["sr_hz"][i].as_py())
        pcm = codecs.decode_tolerant(buf, codec, sr)
        peak = float(np.abs(pcm).max()) if pcm is not None and len(pcm) else 0.0
        if peak <= 0.0:
            bufs.append(buf)
            gains.append(0)
            continue
        gain = NORM_TARGET_PEAK / peak
        pcm16 = np.clip(np.round(pcm * gain * 32767.0), -32768, 32767).astype(np.int16)
        bufs.append(codecs.encode(pcm16, codec, sr))
        gains.append(int(round(20.0 * np.log10(gain) * 100)))
    out = t.drop_columns(["bytes"]).append_column("bytes", pa.array(bufs, pa.binary()))
    return out.append_column("gain_db_e2", pa.array(gains, pa.int64()))


def normalize_clips(clips_dir: str) -> "object":
    """Clip table → same table with peak-normalized payloads + gain column."""
    import ray.data as rd

    return rd.read_parquet(clips_dir).map_batches(
        normalize_batch, batch_format="pyarrow", batch_size=128
    )
