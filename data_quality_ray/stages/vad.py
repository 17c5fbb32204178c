"""Voice-activity detection over the clip table: per-clip speech framing,
lead/tail trim points and an SNR estimate — energy-based, library-free.

A training-data pipeline over speech audio needs VAD twice: to DROP
clips that are mostly silence/noise (quality gate) and to TRIM dead air
before feature extraction so tokens-per-second stats aren't diluted.
This is the audio-payload analogue of the reference's per-record artifact
counting (eeg_features.py:18-40) applied to activity instead of spikes.

Method (standard public recipe — energy VAD with an adaptive floor):
  1. decode → frame the PCM into 20 ms non-overlapping frames,
  2. per-frame RMS; noise floor = 10th-percentile frame RMS,
  3. speech frame ⇔ RMS > max(4 × floor, −60 dBFS); a HOMOGENEOUS clip
     (p90 ≤ 2 × p10 — constant tone or constant silence, no gaps for the
     floor to adapt to) is classified by the absolute −60 dBFS level
     alone, so an always-on clip is all-speech, not all-noise,
  4. SNR(dB) = 20·log10(speech RMS / noise RMS) over the two classes.

Stateless arithmetic (numpy only), but runs as a TASK `map_batches` stage
reading only the payload columns — at 10^12-clip scale this is a pruned
streaming pass, no shuffle anywhere. All ratios are reported as integer
fixed-point (e4 / e2) so downstream oracles and cross-run hashes stay
exact (see the fixed-point rule in pipelines/relational.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from data_quality_ray.functions import codecs

FRAME_MS = 20
FLOOR_MULT = 4.0  # speech threshold = 4× the 10th-percentile frame RMS
ABS_FLOOR = 1e-3  # −60 dBFS on [-1, 1] float PCM: below this is silence


def vad_frames(pcm: np.ndarray, sr_hz: int) -> tuple[np.ndarray, np.ndarray]:
    """(per-frame RMS, speech mask) for one clip — pure kernel, test seam."""
    n = max(1, int(sr_hz * FRAME_MS / 1000))
    n_frames = len(pcm) // n
    if n_frames == 0:
        padded = np.zeros(n, dtype=np.float64)
        padded[: len(pcm)] = pcm
        frames = padded[None, :]
        n_frames = 1
    else:
        frames = pcm[: n_frames * n].reshape(n_frames, n)
    rms = np.sqrt((frames.astype(np.float64) ** 2).mean(axis=1))
    p10, p90 = np.percentile(rms, [10, 90])
    if p90 <= 2.0 * p10:  # homogeneous clip: absolute level decides
        thresh = ABS_FLOOR
    else:
        thresh = max(FLOOR_MULT * p10, ABS_FLOOR)
    return rms, rms > thresh


def vad_stats_batch(batch: pa.Table) -> pa.Table:
    """(clip_id, bytes, sr_hz, codec) → per-clip VAD/SNR stats."""
    bufs = batch["bytes"].to_pylist()
    srs = batch["sr_hz"].to_numpy()
    cods = batch["codec"].to_pylist()
    n = batch.num_rows
    ok = np.zeros(n, dtype=bool)
    n_frames = np.zeros(n, dtype=np.int64)
    n_speech = np.zeros(n, dtype=np.int64)
    ratio_e4 = np.zeros(n, dtype=np.int64)
    lead_ms = np.zeros(n, dtype=np.int64)
    tail_ms = np.zeros(n, dtype=np.int64)
    snr_e2 = np.zeros(n, dtype=np.int64)
    for i in range(n):
        pcm = codecs.decode_tolerant(bufs[i], cods[i], int(srs[i]))
        if pcm is None:
            continue
        ok[i] = True
        rms, speech = vad_frames(pcm, int(srs[i]))
        n_frames[i] = len(speech)
        n_speech[i] = int(speech.sum())
        ratio_e4[i] = round(10_000 * n_speech[i] / n_frames[i])
        if n_speech[i]:
            idx = np.flatnonzero(speech)
            lead_ms[i] = int(idx[0]) * FRAME_MS
            tail_ms[i] = int(len(speech) - 1 - idx[-1]) * FRAME_MS
            s_rms = float(np.sqrt((rms[speech] ** 2).mean()))
            noise = rms[~speech]
            n_rms = float(np.sqrt((noise**2).mean())) if len(noise) else 0.0
            snr = 20.0 * np.log10(s_rms / n_rms) if n_rms > 0 else 120.0
            snr_e2[i] = round(100 * min(snr, 120.0))
        else:
            lead_ms[i] = n_frames[i] * FRAME_MS
    return pa.table(
        {
            "clip_id": batch["clip_id"],
            "decode_ok": pa.array(ok),
            "n_frames": pa.array(n_frames, pa.int64()),
            "n_speech_frames": pa.array(n_speech, pa.int64()),
            "speech_ratio_e4": pa.array(ratio_e4, pa.int64()),
            "lead_trim_ms": pa.array(lead_ms, pa.int64()),
            "tail_trim_ms": pa.array(tail_ms, pa.int64()),
            "snr_db_e2": pa.array(snr_e2, pa.int64()),
        }
    )


def clip_vad_stats(clips_dir: str) -> "object":
    """Dataset of per-clip VAD/SNR stats over a clip table (pruned read)."""
    import ray.data as rd

    return rd.read_parquet(
        clips_dir, columns=["clip_id", "bytes", "sr_hz", "codec"]
    ).map_batches(vad_stats_batch, batch_format="pyarrow", batch_size=256)


# ---------------------------------------------------------------------------
# Speech-segment extraction (the flat-map explode over the VAD mask):
# per clip, the merged speech runs as (start_ms, end_ms) training segments —
# the segmentation step an ASR-corpus pipeline runs between VAD and
# windowing, so each training example is one contiguous utterance.
# ---------------------------------------------------------------------------

MERGE_GAP_MS = 100  # bridge pauses shorter than this into one segment
MIN_SEG_MS = 60  # drop isolated blips shorter than this


def speech_runs(mask: np.ndarray) -> "list[tuple[int, int]]":
    """Merged [start_frame, end_frame) speech runs of one clip's VAD mask.

    Run edges come from one vectorized diff; the merge/min-length pass
    iterates at RUN grain (a handful per clip), not frame grain."""
    edges = np.flatnonzero(np.diff(np.concatenate([[0], mask.astype(np.int8), [0]])))
    raw = list(zip(edges[0::2], edges[1::2]))
    gap_frames = MERGE_GAP_MS // FRAME_MS
    merged: list[tuple[int, int]] = []
    for s, e in raw:
        if merged and s - merged[-1][1] <= gap_frames:
            merged[-1] = (merged[-1][0], e)
        else:
            merged.append((int(s), int(e)))
    min_frames = max(1, MIN_SEG_MS // FRAME_MS)
    return [(s, e) for s, e in merged if e - s >= min_frames]


def segments_batch(batch: pa.Table) -> pa.Table:
    """(clip_id, bytes, sr_hz, codec) → one row per speech segment:
    (clip_id, seg_idx, start_ms, end_ms, dur_ms, seg_rms_e6)."""
    bufs = batch["bytes"].to_pylist()
    srs = batch["sr_hz"].to_numpy()
    cods = batch["codec"].to_pylist()
    ids_out: list[int] = []
    seg_idx: list[int] = []
    start_ms: list[int] = []
    end_ms: list[int] = []
    rms_e6: list[int] = []
    ids = batch["clip_id"].to_pylist()
    for i in range(batch.num_rows):
        pcm = codecs.decode_tolerant(bufs[i], cods[i], int(srs[i]))
        if pcm is None:
            continue
        rms, speech = vad_frames(pcm, int(srs[i]))
        for j, (s, e) in enumerate(speech_runs(speech)):
            ids_out.append(ids[i])
            seg_idx.append(j)
            start_ms.append(s * FRAME_MS)
            end_ms.append(e * FRAME_MS)
            rms_e6.append(round(1e6 * float(np.sqrt((rms[s:e] ** 2).mean()))))
    dur = np.asarray(end_ms, dtype=np.int64) - np.asarray(start_ms, dtype=np.int64)
    return pa.table(
        {
            "clip_id": pa.array(ids_out, batch["clip_id"].type),
            "seg_idx": pa.array(seg_idx, pa.int64()),
            "start_ms": pa.array(start_ms, pa.int64()),
            "end_ms": pa.array(end_ms, pa.int64()),
            "dur_ms": pa.array(dur, pa.int64()),
            "seg_rms_e6": pa.array(rms_e6, pa.int64()),
        }
    )


def clip_speech_segments(clips_dir: str) -> "object":
    """Dataset of per-clip speech segments — a streaming flat-map explode
    (pruned payload read, no shuffle; output grain = utterances)."""
    import ray.data as rd

    return rd.read_parquet(
        clips_dir, columns=["clip_id", "bytes", "sr_hz", "codec"]
    ).map_batches(segments_batch, batch_format="pyarrow", batch_size=256)
