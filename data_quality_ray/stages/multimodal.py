"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Every modality now has REAL on-disk-format decoders with no codec library:
audio (stages/decode.py — WAV/G.711/pcm16 + ADPCM extension), images
(PNG with all five scanline filters, 24-bpp BMP, PPM P6 —
functions/image_codecs.py) and video (Y4M/YUV4MPEG2 C444+C420 demux with
BT.601 conversion — functions/video_codecs.py), alongside the
deterministic header-free fake codecs (``fake-rgb8`` / ``fake-vid8``) used
by tests, and EBML/Matroska + ISO-BMFF container demuxes
(functions/mkv_codec.py, functions/mp4_codec.py) whose raw-video tracks
decode fully. JPEG covers baseline AND progressive (SOF2) scans. Only
pieces that genuinely require a native library (webp images, compressed
mkv/mp4 codec bitstreams) raise a declared ``NotImplementedError``. The Ray-side plumbing (schema, actor-pool
signature, batch sizing, output layout) is uniform across all of them.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

IMAGE_SCHEMA = pa.schema(
    [
        ("image_id", pa.string()),
        ("bytes", pa.binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("format", pa.string()),  # "fake-rgb8" decodable; else stub
    ]
)

VIDEO_SCHEMA = pa.schema(
    [
        ("video_id", pa.string()),
        ("bytes", pa.binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("n_frames", pa.int32()),
        ("format", pa.string()),  # "fake-vid8" decodable; else stub
    ]
)


def decode_image(buf: bytes, width: int, height: int, fmt: str) -> np.ndarray:
    """bytes → (h, w, 3) uint8.

    REAL decoders: ``png`` (stdlib-zlib inflate + scanline unfiltering),
    ``bmp`` (24 bpp BI_RGB), ``ppm`` via
    :mod:`data_quality_ray.functions.image_codecs`, ``jpeg`` (pure-numpy
    T.81 — baseline sequential 4:4:4/4:2:2/4:2:0, grayscale, restart
    markers, AND progressive SOF2 with spectral selection + successive
    approximation; :mod:`data_quality_ray.functions.jpeg_codec`), plus
    the header-free deterministic ``fake-rgb8`` test codec. Only webp
    (native-library codec) remains a declared stub."""
    from data_quality_ray.functions import image_codecs

    if fmt == "fake-rgb8":
        expect = width * height * 3
        if len(buf) != expect:
            raise ValueError(f"fake-rgb8 payload {len(buf)} != {expect}")
        return np.frombuffer(buf, dtype=np.uint8).reshape(height, width, 3)
    if fmt == "png":
        return image_codecs.decode_png(buf)
    if fmt == "bmp":
        return image_codecs.decode_bmp(buf)
    if fmt == "ppm":
        return image_codecs.decode_ppm(buf)
    if fmt == "jpeg":
        from data_quality_ray.functions.jpeg_codec import decode_jpeg

        return decode_jpeg(buf)  # baseline + progressive; arithmetic raises inside
    raise NotImplementedError(
        f"image codec {fmt!r}: decoders needing a native library (webp) "
        "are not available in this environment — plug one into decode_image()"
    )


class ImageFeatureStage:
    """Actor-pool stage: decode → resize (nearest) → channel-stat features.

    ``__init__`` holds per-worker state (target size, any model weights);
    ``__call__`` is per-batch. Output: per-image mean/std per channel and a
    thumb_{size}x{size} flattened thumbnail (list<float32>) — the layout a
    real embedding model would produce.
    """

    def __init__(self, thumb: int = 4):
        self.thumb = thumb

    def _resize_nearest(self, img: np.ndarray, h: int, w: int) -> np.ndarray:
        ys = (np.arange(h) * img.shape[0] // h).clip(0, img.shape[0] - 1)
        xs = (np.arange(w) * img.shape[1] // w).clip(0, img.shape[1] - 1)
        return img[ys][:, xs]

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        bufs = batch["bytes"].to_pylist()
        ws = batch["width"].to_numpy()
        hs = batch["height"].to_numpy()
        fmts = batch["format"].to_pylist()
        ok = np.zeros(n, dtype=bool)
        means = np.zeros((n, 3), dtype=np.float32)
        stds = np.zeros((n, 3), dtype=np.float32)
        thumbs: list[list[float]] = []
        for i in range(n):
            try:
                img = decode_image(bufs[i], int(ws[i]), int(hs[i]), fmts[i])
            except (NotImplementedError, ValueError):
                thumbs.append([])
                continue
            ok[i] = True
            means[i] = img.reshape(-1, 3).mean(axis=0)
            stds[i] = img.reshape(-1, 3).std(axis=0)
            tn = self._resize_nearest(img, self.thumb, self.thumb)
            thumbs.append((tn.astype(np.float32) / 255.0).reshape(-1).tolist())
        return (
            batch.drop_columns(["bytes"])
            .append_column("decode_ok", pa.array(ok))
            .append_column("mean_rgb", pa.array([m.tolist() for m in means], pa.list_(pa.float32())))
            .append_column("std_rgb", pa.array([s.tolist() for s in stds], pa.list_(pa.float32())))
            .append_column("thumb", pa.array(thumbs, pa.list_(pa.float32())))
        )


class FrameSampleStage:
    """Actor-pool stage: sample every k-th frame of a video into one row
    per sampled frame (flat-map shape: output rows ≠ input rows).

    REAL demuxers for ``y4m`` (YUV4MPEG2 — pure-numpy parse + BT.601
    conversion, functions/video_codecs.py), ``mkv``/``webm``
    (EBML/Matroska container demux, functions/mkv_codec.py) and ``mp4``
    (ISO-BMFF box demux with stsz/stsc/stco sample resolution,
    functions/mp4_codec.py) — raw-video tracks decode fully; compressed
    codec bitstreams raise a declared stub naming the codec — plus the
    header-free ``fake-vid8`` test codec."""

    def __init__(self, every_k: int = 4):
        self.every_k = every_k

    def __call__(self, batch: pa.Table) -> pa.Table:
        from data_quality_ray.functions import video_codecs
        from data_quality_ray.functions.mkv_codec import decode_mkv
        from data_quality_ray.functions.mp4_codec import decode_mp4

        vids, frames, idxs = [], [], []
        for i in range(batch.num_rows):
            fmt = batch["format"][i].as_py()
            if fmt == "fake-vid8":
                w = batch["width"][i].as_py()
                h = batch["height"][i].as_py()
                nf = batch["n_frames"][i].as_py()
                buf = np.frombuffer(batch["bytes"][i].as_py(), dtype=np.uint8)
                arr = buf.reshape(nf, h, w, 3)
            elif fmt == "y4m":
                arr = video_codecs.decode_y4m(batch["bytes"][i].as_py())
            elif fmt in ("mkv", "webm"):
                arr = decode_mkv(batch["bytes"][i].as_py())
            elif fmt == "mp4":
                arr = decode_mp4(batch["bytes"][i].as_py())
            else:
                raise NotImplementedError(
                    f"video container {fmt!r}: no demuxer for this format "
                    "in this environment"
                )
            for f in range(0, len(arr), self.every_k):
                vids.append(batch["video_id"][i].as_py())
                idxs.append(f)
                frames.append(arr[f].tobytes())
        return pa.table(
            {
                "video_id": pa.array(vids, pa.string()),
                "frame_idx": pa.array(idxs, pa.int32()),
                "frame_bytes": pa.array(frames, pa.binary()),
            }
        )


def synth_images(n: int, width: int = 16, height: int = 12, seed: int = 5) -> pa.Table:
    """Deterministic image table mixing REAL on-disk formats (png, bmp,
    baseline jpeg — alternating 4:4:4/4:2:0), the raw fake codec, and a
    declared-stub format (webp) for tests/demos."""
    from data_quality_ray.functions import image_codecs
    from data_quality_ray.functions.jpeg_codec import encode_jpeg

    rows = {k: [] for k in ("image_id", "bytes", "width", "height", "format")}
    for i in range(n):
        rng = np.random.default_rng(seed * 1_000_003 + i)
        img = rng.integers(0, 256, (height, width, 3), dtype=np.uint8)
        fmt = "webp" if i % 7 == 0 else ("fake-rgb8", "png", "bmp", "jpeg")[i % 4]
        if fmt == "png":
            payload = image_codecs.encode_png(img)
        elif fmt == "bmp":
            payload = image_codecs.encode_bmp(img)
        elif fmt == "jpeg":
            payload = encode_jpeg(img, quality=92, subsample=bool(i % 2))
        else:  # fake-rgb8 raw frames; webp rows carry raw bytes (stub path)
            payload = img.tobytes()
        rows["image_id"].append(f"img-{i:06d}")
        rows["bytes"].append(payload)
        rows["width"].append(width)
        rows["height"].append(height)
        rows["format"].append(fmt)
    return pa.table(
        {
            "image_id": pa.array(rows["image_id"], pa.string()),
            "bytes": pa.array(rows["bytes"], pa.binary()),
            "width": pa.array(rows["width"], pa.int32()),
            "height": pa.array(rows["height"], pa.int32()),
            "format": pa.array(rows["format"], pa.string()),
        }
    )


def synth_videos(n: int, width: int = 8, height: int = 6, n_frames: int = 12, seed: int = 9) -> pa.Table:
    """Deterministic video table mixing the raw fake codec with REAL Y4M
    container payloads (every third row)."""
    from data_quality_ray.functions import video_codecs

    rows = {k: [] for k in ("video_id", "bytes", "width", "height", "n_frames", "format")}
    for i in range(n):
        rng = np.random.default_rng(seed * 1_000_003 + i)
        arr = rng.integers(0, 256, (n_frames, height, width, 3), dtype=np.uint8)
        fmt = "y4m" if i % 3 == 2 else "fake-vid8"
        payload = video_codecs.encode_y4m(arr) if fmt == "y4m" else arr.tobytes()
        rows["video_id"].append(f"vid-{i:06d}")
        rows["bytes"].append(payload)
        rows["width"].append(width)
        rows["height"].append(height)
        rows["n_frames"].append(n_frames)
        rows["format"].append(fmt)
    return pa.table(
        {
            "video_id": pa.array(rows["video_id"], pa.string()),
            "bytes": pa.array(rows["bytes"], pa.binary()),
            "width": pa.array(rows["width"], pa.int32()),
            "height": pa.array(rows["height"], pa.int32()),
            "n_frames": pa.array(rows["n_frames"], pa.int32()),
            "format": pa.array(rows["format"], pa.string()),
        }
    )
