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


def create_spectrogram_dataset(
    clips_dir: str, out_dir: str, *, render_pngs: int = 0
) -> dict:
    """Streaming spectrogram pipeline: read → decode+STFT (actor pool) →
    write parquet partitioned by split. Returns row counts per split.

    ``render_pngs=N`` additionally renders N sample spectrograms as PNG
    files under ``out_dir/_samples`` (the reference's K4 plot sink role)."""
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
    if render_pngs:
        render_spectrogram_pngs(clips_dir, os.path.join(out_dir, "_samples"), limit=render_pngs)
    return counts


# 6-anchor "inferno-like" ramp, linearly interpolated to a 256×3 LUT — a
# perceptual-ish colormap without any plotting library
_CMAP_ANCHORS = np.array(
    [
        (0, 0, 4),
        (40, 11, 84),
        (121, 28, 109),
        (202, 62, 81),
        (251, 140, 41),
        (252, 255, 164),
    ],
    dtype=np.float64,
)


def _colormap_lut() -> np.ndarray:
    xs = np.linspace(0, 255, len(_CMAP_ANCHORS))
    out = np.empty((256, 3), dtype=np.uint8)
    for c in range(3):
        out[:, c] = np.interp(np.arange(256), xs, _CMAP_ANCHORS[:, c]).astype(np.uint8)
    return out


def render_spectrogram_pngs(
    clips_dir: str, out_dir: str, *, limit: int = 16, db_floor: float = -80.0
) -> list[str]:
    """Render sample spectrograms as PNG files — the reference's K4
    visualization sink (eeg_datasets.py:110-152 ``plot_spectrograms``,
    eeg_features.py:31-37,62), re-expressed as a bounded side output: the
    first ``limit`` clips stream through decode→STFT and each map task
    writes its own PNGs (pure-stdlib encoder, functions/image_codecs.py) —
    no driver-side image accumulation, no plotting library.

    Returns the sorted written file names."""
    import ray.data as rd

    from data_quality_ray.functions.image_codecs import encode_png

    os.makedirs(out_dir, exist_ok=True)
    lut = _colormap_lut()
    ds = rd.read_parquet(
        clips_dir, columns=["clip_id", "bytes", "sr_hz", "codec"]
    ).limit(limit)

    def render(t: pa.Table) -> pa.Table:
        names = []
        for i in range(t.num_rows):
            pcm = codecs.decode_tolerant(
                t["bytes"][i].as_py(), t["codec"][i].as_py(), int(t["sr_hz"][i].as_py())
            )
            if pcm is None:
                continue
            s = stft_db(np.nan_to_num(pcm.astype(np.float64)))  # (frames, bins) ≤ 0 dB
            img8 = np.clip((s - db_floor) * (255.0 / -db_floor), 0, 255).astype(np.uint8)
            rgb = lut[img8.T[::-1]]  # freq on y (low at bottom), time on x
            name = f"{t['clip_id'][i].as_py()}.png"
            with open(os.path.join(out_dir, name), "wb") as f:
                f.write(encode_png(rgb))
            names.append(name)
        return pa.table({"file": pa.array(names, pa.string())})

    out = ds.map_batches(render, batch_format="pyarrow").to_pandas()
    return sorted(out["file"])
