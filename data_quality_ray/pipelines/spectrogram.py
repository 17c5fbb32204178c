"""Derived spectrogram dataset — the reference's second entry point
(``timeseries:create_spectrograms``, SURVEY.md §3.2) re-expressed streaming.

Reference shape (eeg_datasets.py:160-237): per file → Bernoulli FILE-grain
split → per (epoch, channel): nan_to_num → STFT → |.| → dB → accumulate the
WHOLE corpus in a dict-of-lists → CSV. The unbounded in-memory accumulator
and the unseeded file-grain split are the two things deliberately replaced:

- streaming ``map_batches`` (never materializes the corpus);
- deterministic FRAGMENT-grain split: md5 of the input fragment id, so all
  rows of one shard land on one side (the reference's 'whole recordings per
  side' intent, eeg_datasets.py:181-183) at any cluster size;
- STFT from scratch in numpy (librosa's stft role, eeg_datasets.py:197-202):
  frame → Hann window → rfft → power → dB re max.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from data_quality_ray.functions import codecs
from data_quality_ray.functions.hashing import split_of

N_FFT = 256
HOP = 128


def stft_db(x: np.ndarray) -> np.ndarray:
    """(frames, N_FFT//2+1) power spectrogram in dB re max (librosa-style)."""
    if len(x) < N_FFT:
        x = np.pad(x, (0, N_FFT - len(x)))
    n_frames = 1 + (len(x) - N_FFT) // HOP
    idx = np.arange(N_FFT)[None, :] + HOP * np.arange(n_frames)[:, None]
    frames = x[idx] * np.hanning(N_FFT)[None, :]
    spec = np.fft.rfft(frames, axis=1)
    power = spec.real**2 + spec.imag**2
    ref = max(power.max(), 1e-20)
    return (10.0 * np.log10(np.maximum(power, 1e-20) / ref)).astype(np.float32)


class SpectrogramStage:
    """Actor-pool stage: decode → STFT → dB; emits flattened spectrogram +
    shape columns (list columns survive Arrow round-trips; SURVEY.md §1.2
    nested-cell mapping of eeg_datasets.py:208-214)."""

    def __init__(self, clip_grain_split: bool = False):
        # fragment-grain split by default (reference file-grain intent);
        # clip-grain available for parity with O1
        self.clip_grain = clip_grain_split

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        bufs = batch["bytes"].to_pylist()
        srs = batch["sr_hz"].to_numpy()
        cods = batch["codec"].to_pylist()
        ids = batch["clip_id"].to_pylist()
        specs: list[list[float]] = []
        frames = np.zeros(n, dtype=np.int32)
        bins = np.zeros(n, dtype=np.int32)
        ok = np.zeros(n, dtype=bool)
        for i in range(n):
            pcm = codecs.decode_tolerant(bufs[i], cods[i], int(srs[i]))
            if pcm is None:
                specs.append([])
                continue
            s = stft_db(np.nan_to_num(pcm.astype(np.float64)))
            ok[i] = True
            frames[i] = s.shape[0]
            bins[i] = s.shape[1]
            specs.append(s.reshape(-1).tolist())
        from data_quality_ray.pipelines.windows import fragment_key

        split = [
            split_of(cid if self.clip_grain else fragment_key(cid)) for cid in ids
        ]
        return pa.table(
            {
                "clip_id": batch["clip_id"],
                "decode_ok": pa.array(ok),
                "n_frames": pa.array(frames, pa.int32()),
                "n_bins": pa.array(bins, pa.int32()),
                "spectrogram_db": pa.array(specs, pa.list_(pa.float32())),
                "split": pa.array(split, pa.string()),
            }
        )


def create_spectrogram_dataset(clips_dir: str, out_dir: str) -> dict:
    """Streaming spectrogram pipeline: read → decode+STFT (actor pool) →
    write parquet partitioned by split. Returns row counts per split."""
    import ray.data as rd

    from data_quality_ray import config

    ds = rd.read_parquet(clips_dir, columns=["clip_id", "bytes", "sr_hz", "codec"])
    ds = ds.map_batches(
        SpectrogramStage,
        batch_format="pyarrow",
        batch_size=512,
        concurrency=config.actor_pool_bounds(),
    )
    ds.write_parquet(out_dir, partition_cols=["split"])
    counts = dict(
        (r["split"], r["count()"])
        for r in rd.read_parquet(out_dir, columns=["split"]).groupby("split").count().take_all()
    )
    return counts
