"""Pure-numpy video container: Y4M (YUV4MPEG2, public mjpegtools format).

Y4M is a real on-disk video format with a plain-text header and raw YUV
frames — parseable with no codec library, the video counterpart of the
PNG/BMP closure in image_codecs.py. Supported colorspaces: C444 (full
chroma, near-lossless round-trip) and C420jpeg-style 4:2:0 (2×2 chroma
subsampling). Conversion uses the BT.601 full-range matrix, integer-stable
both ways.
"""

from __future__ import annotations

import numpy as np

_MAGIC = b"YUV4MPEG2"


def rgb_to_yuv(rgb: np.ndarray) -> np.ndarray:
    """(h, w, 3) uint8 RGB → (h, w, 3) uint8 YUV (BT.601 full range)."""
    m = np.array(
        [[0.299, 0.587, 0.114], [-0.168736, -0.331264, 0.5], [0.5, -0.418688, -0.081312]]
    )
    f = rgb.astype(np.float64) @ m.T
    f[..., 1:] += 128.0
    return np.clip(np.round(f), 0, 255).astype(np.uint8)


def yuv_to_rgb(yuv: np.ndarray) -> np.ndarray:
    """(h, w, 3) uint8 YUV → (h, w, 3) uint8 RGB (inverse BT.601)."""
    f = yuv.astype(np.float64)
    y = f[..., 0]
    u = f[..., 1] - 128.0
    v = f[..., 2] - 128.0
    rgb = np.stack(
        [y + 1.402 * v, y - 0.344136 * u - 0.714136 * v, y + 1.772 * u], axis=-1
    )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def encode_y4m(frames: np.ndarray, fps: tuple[int, int] = (25, 1), c420: bool = False) -> bytes:
    """(n, h, w, 3) uint8 RGB frames → Y4M bytes (C444 or C420)."""
    frames = np.ascontiguousarray(frames, dtype=np.uint8)
    n, h, w, c = frames.shape
    if c != 3:
        raise ValueError(f"encode_y4m expects (n, h, w, 3), got {frames.shape}")
    if c420 and (h % 2 or w % 2):
        raise ValueError("C420 needs even dimensions")
    cs = b"C420jpeg" if c420 else b"C444"
    out = bytearray(
        _MAGIC + b" W%d H%d F%d:%d Ip A1:1 %s\n" % (w, h, fps[0], fps[1], cs)
    )
    for i in range(n):
        yuv = rgb_to_yuv(frames[i])
        out += b"FRAME\n"
        out += yuv[..., 0].tobytes()
        if c420:
            # 2×2 chroma mean (jpeg-style siting)
            for ch in (1, 2):
                p = yuv[..., ch].astype(np.float64).reshape(h // 2, 2, w // 2, 2)
                out += np.clip(np.round(p.mean(axis=(1, 3))), 0, 255).astype(np.uint8).tobytes()
        else:
            out += yuv[..., 1].tobytes()
            out += yuv[..., 2].tobytes()
    return bytes(out)


def decode_y4m(buf: bytes) -> np.ndarray:
    """Y4M bytes → (n, h, w, 3) uint8 RGB frames."""
    nl = buf.find(b"\n")
    if nl < 0 or not buf.startswith(_MAGIC):
        raise ValueError("y4m: bad stream header")
    w = h = None
    c420 = False
    for tok in buf[len(_MAGIC) : nl].split():
        if tok[:1] == b"W":
            w = int(tok[1:])
        elif tok[:1] == b"H":
            h = int(tok[1:])
        elif tok[:1] == b"C":
            cs = tok[1:].decode()
            if cs.startswith("420"):
                c420 = True
            elif cs != "444":
                raise NotImplementedError(f"y4m: colorspace C{cs} not supported")
    if not w or not h:
        raise ValueError("y4m: missing W/H in header")
    ysz = w * h
    csz = (w // 2) * (h // 2) if c420 else ysz
    frame_bytes = ysz + 2 * csz
    frames = []
    pos = nl + 1
    while pos < len(buf):
        fnl = buf.find(b"\n", pos)
        if fnl < 0 or buf[pos : pos + 5] != b"FRAME":
            raise ValueError(f"y4m: bad frame marker at offset {pos}")
        pos = fnl + 1
        if pos + frame_bytes > len(buf):
            raise ValueError("y4m: truncated frame payload")
        y = np.frombuffer(buf, np.uint8, ysz, pos).reshape(h, w)
        u = np.frombuffer(buf, np.uint8, csz, pos + ysz)
        v = np.frombuffer(buf, np.uint8, csz, pos + ysz + csz)
        if c420:
            u = u.reshape(h // 2, w // 2).repeat(2, 0).repeat(2, 1)
            v = v.reshape(h // 2, w // 2).repeat(2, 0).repeat(2, 1)
        else:
            u = u.reshape(h, w)
            v = v.reshape(h, w)
        frames.append(yuv_to_rgb(np.stack([y, u, v], axis=-1)))
        pos += frame_bytes
    if not frames:
        raise ValueError("y4m: no frames")
    return np.stack(frames)
