"""Corpus-building transforms over the clip table: utterance
materialization and speed perturbation.

Two steps an ASR training pipeline runs AFTER quality filtering:

- ``utterance_clips``: crop each clip to its VAD speech segments and
  re-encode every segment as its OWN clip row (stages/vad.py finds the
  segments as metadata; this materializes the payloads) — the explode that
  turns "recordings" into "training utterances". Derived ids are
  ``<clip_id>-u<seg_idx>`` so lineage stays readable and deterministic.

- ``speed_perturb_clips``: the standard ASR augmentation (public recipe —
  Ko et al., "Audio augmentation for speech recognition", Interspeech
  2015): resample the waveform by factors like 0.9/1.1 while keeping the
  nominal sample rate, changing duration and pitch together. Each factor
  appends a full derived copy (`<clip_id>-sp<factor·100>`); factor 1.0 is
  the identity and is skipped (the original row is already in the table).

Both are streaming flat-map task stages over a pruned payload read — no
shuffle, no state; output rows re-encode with the source codec so the
derived tables are drop-in clip tables (schema-compatible unions).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from data_quality_ray.functions import codecs
from data_quality_ray.stages.decode import _resample_linear
from data_quality_ray.stages.vad import FRAME_MS, speech_runs, vad_frames


def _encode16(pcm: np.ndarray, codec: str, sr: int) -> bytes:
    pcm16 = np.clip(np.round(pcm * 32767.0), -32768, 32767).astype(np.int16)
    return codecs.encode(pcm16, codec, sr)


def utterance_batch(t: pa.Table) -> pa.Table:
    """Clip rows → one re-encoded clip row per VAD speech segment."""
    ids, bufs, srs, durs, cods = [], [], [], [], []
    for i in range(t.num_rows):
        sr = int(t["sr_hz"][i].as_py())
        codec = t["codec"][i].as_py()
        pcm = codecs.decode_tolerant(t["bytes"][i].as_py(), codec, sr)
        if pcm is None:
            continue
        _, speech = vad_frames(pcm, sr)
        frame_n = max(1, int(sr * FRAME_MS / 1000))
        for j, (s, e) in enumerate(speech_runs(speech)):
            seg = pcm[s * frame_n : e * frame_n]
            if len(seg) == 0:
                continue
            ids.append(f"{t['clip_id'][i].as_py()}-u{j}")
            bufs.append(_encode16(seg, codec, sr))
            srs.append(sr)
            durs.append(int(1000 * len(seg) / sr))
            cods.append(codec)
    return pa.table(
        {
            "clip_id": pa.array(ids, pa.string()),
            "bytes": pa.array(bufs, pa.binary()),
            "sr_hz": pa.array(srs, pa.int32()),
            "dur_ms": pa.array(durs, pa.int32()),
            "codec": pa.array(cods, pa.string()),
        }
    )


def utterance_clips(clips_dir: str) -> "object":
    """Clip table → utterance-grain clip table (payloads materialized)."""
    import ray.data as rd

    return rd.read_parquet(
        clips_dir, columns=["clip_id", "bytes", "sr_hz", "codec"]
    ).map_batches(utterance_batch, batch_format="pyarrow", batch_size=128)


def speed_perturb_batch(t: pa.Table, factors: "tuple[float, ...]") -> pa.Table:
    """Clip rows → one derived row per (clip, non-identity factor).

    Speed change = resample by 1/factor while declaring the ORIGINAL rate:
    factor 1.1 yields 1/1.1× the samples → plays 10% faster and one
    semitone-ish higher, exactly the Ko-et-al. recipe."""
    ids, bufs, srs, durs, cods = [], [], [], [], []
    for i in range(t.num_rows):
        sr = int(t["sr_hz"][i].as_py())
        codec = t["codec"][i].as_py()
        pcm = codecs.decode_tolerant(t["bytes"][i].as_py(), codec, sr)
        if pcm is None:
            continue
        for f in factors:
            if f == 1.0:
                continue
            out = _resample_linear(pcm, int(round(sr * f)), sr)
            ids.append(f"{t['clip_id'][i].as_py()}-sp{int(round(f * 100))}")
            bufs.append(_encode16(out, codec, sr))
            srs.append(sr)
            durs.append(int(1000 * len(out) / sr))
            cods.append(codec)
    return pa.table(
        {
            "clip_id": pa.array(ids, pa.string()),
            "bytes": pa.array(bufs, pa.binary()),
            "sr_hz": pa.array(srs, pa.int32()),
            "dur_ms": pa.array(durs, pa.int32()),
            "codec": pa.array(cods, pa.string()),
        }
    )


def speed_perturb_clips(
    clips_dir: str, factors: "tuple[float, ...]" = (0.9, 1.1)
) -> "object":
    """Clip table → derived speed-perturbed copies (originals NOT included;
    union with the source table for the augmented corpus)."""
    import functools

    import ray.data as rd

    return rd.read_parquet(
        clips_dir, columns=["clip_id", "bytes", "sr_hz", "codec"]
    ).map_batches(
        functools.partial(speed_perturb_batch, factors=factors),
        batch_format="pyarrow",
        batch_size=128,
    )
