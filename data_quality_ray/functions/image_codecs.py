"""Pure-numpy/stdlib image codecs: PNG (zlib) and 24-bit BMP.

No imaging library exists in this environment, but PNG needs only DEFLATE
(stdlib ``zlib``) plus scanline unfiltering, and uncompressed BMP is plain
header parsing — so both are implemented for real here (public file-format
specs: PNG RFC 2083 / ISO 15948, BITMAPINFOHEADER). These close the
image-decode seam in ``stages/multimodal.py``; formats that genuinely need
a native codec (jpeg/webp) remain declared stubs.

Decode supports:
- PNG: 8-bit depth, color types 0 (gray), 2 (RGB), 6 (RGBA, alpha dropped),
  all five filter types (None/Sub/Up/Average/Paeth), non-interlaced.
- BMP: BITMAPINFOHEADER, 24 bpp, BI_RGB, bottom-up or top-down.

Encode emits canonical, widely-readable files (PNG color type 2 filter 0;
BMP 24 bpp bottom-up) — used by the spectrogram PNG sink (reference K4,
eeg_datasets.py:110-152) and the codec round-trip tests.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------


def _unfilter_scanlines(raw: bytes, h: int, w: int, bpp: int) -> np.ndarray:
    """Reverse the per-scanline PNG filters → (h, w·bpp) uint8.

    Filters None/Up are fully vectorized; Sub is a per-channel cumsum
    (mod 256); Average/Paeth have a true left-pixel recurrence and run as
    per-pixel loops — rare in encoder output and bounded by scanline width.
    """
    stride = w * bpp
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    pos = 0
    for y in range(h):
        f = raw[pos]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos + 1).astype(
            np.int32
        )
        pos += 1 + stride
        if f == 0:  # None
            cur = line
        elif f == 2:  # Up
            cur = (line + prev) & 0xFF
        elif f == 1:  # Sub: per-channel cumsum mod 256
            cur = line.copy()
            for r in range(bpp):
                cur[r::bpp] = np.cumsum(cur[r::bpp]) & 0xFF
        elif f == 3:  # Average
            cur = line.copy()
            for x in range(stride):
                left = cur[x - bpp] if x >= bpp else 0
                cur[x] = (cur[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            cur = line.copy()
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb and pa_ <= pc) else (b if pb <= pc else c)
                cur[x] = (cur[x] + pred) & 0xFF
        else:
            raise ValueError(f"png: unknown filter type {f} on scanline {y}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out


def decode_png(buf: bytes) -> np.ndarray:
    """PNG bytes → (h, w, 3) uint8 RGB."""
    if buf[:8] != _PNG_MAGIC:
        raise ValueError("png: bad signature")
    pos = 8
    ihdr = None
    idat = bytearray()
    while pos + 8 <= len(buf):
        (length,) = struct.unpack(">I", buf[pos : pos + 4])
        ctype = buf[pos + 4 : pos + 8]
        data = buf[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
    if ihdr is None:
        raise ValueError("png: missing IHDR")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0:
        raise NotImplementedError(f"png: unsupported depth/comp/filter {ihdr}")
    if interlace != 0:
        raise NotImplementedError("png: Adam7 interlacing not supported")
    bpp = {0: 1, 2: 3, 6: 4}.get(color)
    if bpp is None:
        raise NotImplementedError(f"png: color type {color} not supported")
    raw = zlib.decompress(bytes(idat))
    expect = h * (1 + w * bpp)
    if len(raw) != expect:
        raise ValueError(f"png: raw stream {len(raw)} != {expect}")
    mat = _unfilter_scanlines(raw, h, w, bpp).reshape(h, w, bpp)
    if color == 0:
        return np.repeat(mat, 3, axis=2)
    if color == 6:
        return np.ascontiguousarray(mat[:, :, :3])
    return mat


def _chunk(ctype: bytes, data: bytes) -> bytes:
    crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
    return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)


def encode_png(img: np.ndarray, compress_level: int = 6) -> bytes:
    """(h, w, 3) uint8 RGB → PNG bytes (color type 2, filter 0)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = np.repeat(img[:, :, None], 3, axis=2)
    h, w, c = img.shape
    if c != 3:
        raise ValueError(f"encode_png expects (h, w, 3), got {img.shape}")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    # filter byte 0 per scanline, in one vectorized hstack
    raw = np.hstack([np.zeros((h, 1), np.uint8), img.reshape(h, w * 3)]).tobytes()
    return (
        _PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, compress_level))
        + _chunk(b"IEND", b"")
    )


# ---------------------------------------------------------------------------
# BMP (24 bpp, BI_RGB)
# ---------------------------------------------------------------------------


def decode_bmp(buf: bytes) -> np.ndarray:
    """BMP bytes → (h, w, 3) uint8 RGB."""
    if buf[:2] != b"BM":
        raise ValueError("bmp: bad signature")
    (data_off,) = struct.unpack("<I", buf[10:14])
    (hdr_size,) = struct.unpack("<I", buf[14:18])
    if hdr_size < 40:
        raise NotImplementedError(f"bmp: DIB header size {hdr_size} not supported")
    w, h_signed = struct.unpack("<ii", buf[18:26])
    planes, bpp = struct.unpack("<HH", buf[26:30])
    (compression,) = struct.unpack("<I", buf[30:34])
    if bpp != 24 or compression != 0:
        raise NotImplementedError(f"bmp: only 24bpp BI_RGB supported (got {bpp}/{compression})")
    h = abs(h_signed)
    stride = (w * 3 + 3) & ~3  # rows padded to 4 bytes
    px = np.frombuffer(buf, dtype=np.uint8, count=h * stride, offset=data_off)
    rows = px.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if h_signed > 0:  # bottom-up storage
        rows = rows[::-1]
    return np.ascontiguousarray(rows[:, :, ::-1])  # BGR → RGB


def encode_bmp(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → BMP bytes (24 bpp, bottom-up)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w, c = img.shape
    if c != 3:
        raise ValueError(f"encode_bmp expects (h, w, 3), got {img.shape}")
    stride = (w * 3 + 3) & ~3
    body = np.zeros((h, stride), dtype=np.uint8)
    body[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # RGB → BGR, bottom-up
    data = body.tobytes()
    file_size = 54 + len(data)
    header = (
        b"BM"
        + struct.pack("<IHHI", file_size, 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    )
    return header + data


# ---------------------------------------------------------------------------
# PPM (P6 binary, 8-bit)
# ---------------------------------------------------------------------------


def decode_ppm(buf: bytes) -> np.ndarray:
    """PPM P6 bytes → (h, w, 3) uint8 RGB (comments tolerated)."""
    if buf[:2] != b"P6":
        raise ValueError("ppm: bad magic (only binary P6 supported)")
    # header = magic, width, height, maxval — whitespace-separated with
    # optional '#' comment lines
    fields: list[int] = []
    pos = 2
    while len(fields) < 3:
        while pos < len(buf) and buf[pos : pos + 1].isspace():
            pos += 1
        if pos < len(buf) and buf[pos : pos + 1] == b"#":
            pos = buf.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(buf) and not buf[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(buf[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise NotImplementedError(f"ppm: maxval {maxval} != 255 not supported")
    expect = w * h * 3
    data = np.frombuffer(buf, dtype=np.uint8, count=expect, offset=pos)
    return data.reshape(h, w, 3).copy()


def encode_ppm(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → PPM P6 bytes."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w, c = img.shape
    if c != 3:
        raise ValueError(f"encode_ppm expects (h, w, 3), got {img.shape}")
    return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()


# ---------------------------------------------------------------------------
# WebP container probe (RIFF/VP8X demux; codec bitstreams stay declared) — r5
# ---------------------------------------------------------------------------


def webp_probe(buf: bytes) -> dict:
    """Demux a WebP container (RIFF chunks per the public spec): returns
    {chunks, kind, width, height, has_alpha}. The chunk walk, VP8X canvas
    size, lossy-VP8 frame-tag dimensions and VP8L header are all parsed;
    only the codec BITSTREAMS (VP8 boolean-coder / VP8L entropy image)
    remain the declared native-library seam (``decode_image``). Validated
    against a real lossy+alpha webp in tests."""
    import struct as _struct

    if len(buf) < 16 or buf[:4] != b"RIFF" or buf[8:12] != b"WEBP":
        raise ValueError("not a WebP (RIFF/WEBP) container")
    out = {"chunks": [], "kind": None, "width": None, "height": None, "has_alpha": False}
    pos = 12
    while pos + 8 <= len(buf):
        tag = buf[pos : pos + 4].decode("latin1")
        (sz,) = _struct.unpack("<I", buf[pos + 4 : pos + 8])
        body = buf[pos + 8 : pos + 8 + sz]
        out["chunks"].append((tag, sz))
        if tag == "VP8X" and sz >= 10:
            flags = body[0]
            out["has_alpha"] = bool(flags & 0x10)
            out["width"] = 1 + int.from_bytes(body[4:7], "little")
            out["height"] = 1 + int.from_bytes(body[7:10], "little")
        elif tag == "VP8 " and sz >= 10:
            out["kind"] = "lossy"
            if body[3:6] == b"\x9d\x01\x2a":  # keyframe start code
                w = int.from_bytes(body[6:8], "little") & 0x3FFF
                h = int.from_bytes(body[8:10], "little") & 0x3FFF
                out["frame_width"], out["frame_height"] = w, h
                if out["width"] is None:
                    out["width"], out["height"] = w, h
        elif tag == "VP8L" and sz >= 5:
            out["kind"] = "lossless"
            if body[0] == 0x2F:
                bits = int.from_bytes(body[1:5], "little")
                if out["width"] is None:
                    out["width"] = 1 + (bits & 0x3FFF)
                    out["height"] = 1 + ((bits >> 14) & 0x3FFF)
                out["has_alpha"] = out["has_alpha"] or bool((bits >> 28) & 1)
        elif tag == "ALPH":
            out["has_alpha"] = True
        pos += 8 + sz + (sz & 1)  # chunks are 2-byte aligned
    if out["kind"] is None and not any(t == "VP8X" for t, _ in out["chunks"]):
        raise ValueError("WebP container has no VP8/VP8L/VP8X chunk")
    return out
