"""Pure-numpy baseline JPEG codec (ITU-T T.81 / JFIF — public file format).

Closes the largest remaining image-format seam in ``stages/multimodal.py``
(VERDICT r2 item 6): no imaging library exists in this environment, but
baseline sequential JPEG needs only an 8×8 DCT (a matrix multiply), the
Annex-K quantization/Huffman tables, and a bit reader — all implementable
from the published standard.

Decode supports: baseline sequential DCT (SOF0; SOF1 extended-sequential
with 8-bit precision decodes identically), PROGRESSIVE DCT (SOF2, Annex G:
spectral selection + successive approximation — DC/AC first and refinement
scans with EOBn runs; round 5), grayscale or 3-component YCbCr, arbitrary
sampling factors (4:4:4 / 4:2:2 / 4:2:0 via replication upsampling),
restart intervals (DRI/RSTn). Arithmetic coding and the remaining SOF
variants raise ``NotImplementedError`` — the declared native-library seams
along with webp.

Encode (used to synthesize test fixtures) emits baseline JFIF (4:4:4 or
4:2:0) or progressive 4:4:4 (:func:`encode_jpeg_progressive`), standard
Annex-K tables with libjpeg-style quality scaling.

The per-symbol Huffman loop is Python (inherently bit-serial); the DCT /
IDCT / quantize / color transforms are vectorized over all blocks at once.
Throughput is adequate for the actor-pool decode stage's test scale; a
native codec slots in behind the same ``decode_image`` seam for production.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# Constants from the public standard (ITU-T T.81 Annex K)
# ---------------------------------------------------------------------------

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)
UNZIGZAG = np.argsort(ZIGZAG)

# Annex K.1 luminance / K.2 chrominance quantization tables (natural order)
STD_LUMA_QT = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
STD_CHROMA_QT = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

# Annex K.3 typical Huffman tables: (bits[1..16], values)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# 8×8 DCT-II basis matrix: C @ block @ C.T is the forward transform
_K = np.arange(8)
_DCT_C = np.cos((2 * _K[None, :] + 1) * _K[:, None] * np.pi / 16) * np.sqrt(2.0 / 8)
_DCT_C[0] = np.sqrt(1.0 / 8)


def _quality_scaled(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg-style quality scaling of a base quantization table."""
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)


# ---------------------------------------------------------------------------
# Huffman code construction (canonical codes from (bits, values))
# ---------------------------------------------------------------------------


def _build_codes(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length) for the encoder."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _build_decode_map(bits: list[int], values: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) → symbol for the decoder."""
    out: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return out


def _bit_size(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:  # byte stuffing
                self.buf.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec
        return bytes(self.buf)


def _rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    f = img.astype(np.float64)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _to_blocks(plane: np.ndarray) -> np.ndarray:
    """(h, w) → (n_blocks_y, n_blocks_x, 8, 8), edge-padded to multiples of 8."""
    h, w = plane.shape
    ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    if (ph, pw) != (h, w):
        plane = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
    return plane.reshape(ph // 8, 8, pw // 8, 8).transpose(0, 2, 1, 3)


def _fdct_quant(blocks: np.ndarray, qt: np.ndarray) -> np.ndarray:
    """Forward DCT + quantize every block at once → int zigzag coefficients."""
    shifted = blocks.reshape(-1, 8, 8) - 128.0
    coef = np.einsum("ij,bjk,lk->bil", _DCT_C, shifted, _DCT_C)
    q = np.round(coef / qt.reshape(8, 8)).astype(np.int64)
    return q.reshape(-1, 64)[:, ZIGZAG]  # natural → zigzag


def _encode_block(
    zz: np.ndarray, prev_dc: int, dc_codes: dict, ac_codes: dict, w: _BitWriter
) -> int:
    diff = int(zz[0]) - prev_dc
    size = _bit_size(diff)
    code, length = dc_codes[size]
    w.write(code, length)
    if size:
        v = diff if diff > 0 else diff + (1 << size) - 1
        w.write(v, size)
    run = 0
    last_nz = int(np.nonzero(zz[1:])[0][-1]) + 1 if np.any(zz[1:]) else 0
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, l = ac_codes[0xF0]  # ZRL
            w.write(c, l)
            run -= 16
        size = _bit_size(v)
        c, l = ac_codes[(run << 4) | size]
        w.write(c, l)
        w.write(v if v > 0 else v + (1 << size) - 1, size)
        run = 0
    if last_nz < 63:
        c, l = ac_codes[0x00]  # EOB
        w.write(c, l)
    return int(zz[0])


def encode_jpeg(img: np.ndarray, quality: int = 85, subsample: bool = False) -> bytes:
    """(h, w, 3) uint8 RGB → baseline JFIF bytes (4:4:4, or 4:2:0 with
    ``subsample=True`` — exercises the decoder's chroma upsampling)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = np.repeat(img[:, :, None], 3, axis=2)
    h, w, c = img.shape
    if c != 3:
        raise ValueError(f"encode_jpeg expects (h, w, 3), got {img.shape}")
    luma_qt = _quality_scaled(STD_LUMA_QT, quality)
    chroma_qt = _quality_scaled(STD_CHROMA_QT, quality)
    ycc = _rgb_to_ycbcr(img)
    y_plane = ycc[..., 0]
    if subsample:
        # 2×2 box-average chroma; pad odd dims by edge replication first
        ph, pw = (h + 1) // 2 * 2, (w + 1) // 2 * 2
        cc = np.pad(ycc[..., 1:], ((0, ph - h), (0, pw - w), (0, 0)), mode="edge")
        cc = cc.reshape(ph // 2, 2, pw // 2, 2, 2).mean(axis=(1, 3))
        cb_plane, cr_plane = cc[..., 0], cc[..., 1]
        samp = [(2, 2), (1, 1), (1, 1)]
    else:
        cb_plane, cr_plane = ycc[..., 1], ycc[..., 2]
        samp = [(1, 1), (1, 1), (1, 1)]

    dc_l = _build_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_l = _build_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _build_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _build_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)

    planes = [y_plane, cb_plane, cr_plane]
    qts = [luma_qt, chroma_qt, chroma_qt]
    blocks = [_to_blocks(p) for p in planes]
    # pad block grids so the MCU loop below always finds (by, bx)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    zz: list[np.ndarray] = []
    grids: list[tuple[int, int]] = []
    for ci in range(3):
        need_y = mcus_y * samp[ci][1]
        need_x = mcus_x * samp[ci][0]
        b = blocks[ci]
        if b.shape[0] < need_y or b.shape[1] < need_x:
            b = np.pad(
                b,
                ((0, need_y - b.shape[0]), (0, need_x - b.shape[1]), (0, 0), (0, 0)),
                mode="edge",
            )
        grids.append((b.shape[0], b.shape[1]))
        zz.append(_fdct_quant(b, qts[ci]).reshape(b.shape[0], b.shape[1], 64))

    writer = _BitWriter()
    prev = [0, 0, 0]
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci in range(3):
                hs, vs = samp[ci]
                dct, act = (dc_l, ac_l) if ci == 0 else (dc_c, ac_c)
                for by in range(vs):
                    for bx in range(hs):
                        prev[ci] = _encode_block(
                            zz[ci][my * vs + by, mx * hs + bx], prev[ci], dct, act, writer
                        )
    scan = writer.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")  # APP0
    out += seg(0xFFDB, bytes([0]) + bytes(luma_qt[ZIGZAG].tolist()))
    out += seg(0xFFDB, bytes([1]) + bytes(chroma_qt[ZIGZAG].tolist()))
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([3])
    for ci, (hs, vs) in enumerate(samp):
        sof += bytes([ci + 1, (hs << 4) | vs, 0 if ci == 0 else 1])
    out += seg(0xFFC0, sof)
    for cls, tid, bits, vals in (
        (0, 0, DC_LUMA_BITS, DC_LUMA_VALS),
        (1, 0, AC_LUMA_BITS, AC_LUMA_VALS),
        (0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS),
        (1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS),
    ):
        out += seg(0xFFC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))
    sos = bytes([3])
    for ci in range(3):
        t = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (t << 4) | t])
    sos += bytes([0, 63, 0])
    out += seg(0xFFDA, sos)
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment with 0xFF00
    destuffing; stops at any non-RST marker."""

    def __init__(self, buf: bytes, pos: int) -> None:
        self.buf = buf
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        while self.nbits <= 24:
            if self.marker is not None or self.pos >= len(self.buf):
                self.acc = (self.acc << 8) & 0xFFFFFFFF
                self.nbits += 8  # pad past the end (spec-sanctioned)
                continue
            b = self.buf[self.pos]
            if b == 0xFF:
                nxt = self.buf[self.pos + 1] if self.pos + 1 < len(self.buf) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:  # RSTn handled by align_restart
                    self.marker = nxt
                    continue
                else:
                    self.marker = nxt
                    continue
            else:
                self.pos += 1
            self.acc = ((self.acc << 8) | b) & 0xFFFFFFFF
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_restart(self) -> None:
        """Consume an RSTn marker and realign to the next byte."""
        self.acc = 0
        self.nbits = 0
        if self.marker is not None and 0xD0 <= self.marker <= 0xD7:
            self.pos += 2
            self.marker = None
        else:  # find it in the raw stream (we may not have hit it yet)
            while self.pos + 1 < len(self.buf):
                if self.buf[self.pos] == 0xFF and 0xD0 <= self.buf[self.pos + 1] <= 0xD7:
                    self.pos += 2
                    return
                self.pos += 1


def _decode_huff(r: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("jpeg: invalid Huffman code")


def _extend(v: int, size: int) -> int:
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _idct_blocks(coef: np.ndarray) -> np.ndarray:
    """(n, 8, 8) dequantized coefficients → (n, 8, 8) spatial samples."""
    return np.einsum("ij,nik,kl->njl", _DCT_C, coef, _DCT_C) + 128.0


def decode_jpeg(buf: bytes) -> np.ndarray:
    """Baseline JPEG bytes → (h, w, 3) uint8 RGB (grayscale replicated)."""
    if buf[:2] != b"\xff\xd8":
        raise ValueError("jpeg: bad SOI")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) → decode map
    comps: list[dict] = []
    h = w = 0
    restart_interval = 0
    scan_pos = None
    progressive = False
    while pos + 4 <= len(buf):
        if buf[pos] != 0xFF:
            raise ValueError(f"jpeg: expected marker at {pos}")
        marker = buf[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (length,) = struct.unpack(">H", buf[pos + 2 : pos + 4])
        data = buf[pos + 4 : pos + 2 + length]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            dp = 0
            while dp < len(data):
                pq, tq = data[dp] >> 4, data[dp] & 0xF
                if pq != 0:
                    raise NotImplementedError("jpeg: 16-bit quant tables")
                zz = np.frombuffer(data, dtype=np.uint8, count=64, offset=dp + 1)
                nat = np.empty(64, dtype=np.int64)
                nat[ZIGZAG] = zz  # stored zigzag → natural order
                qts[tq] = nat
                dp += 65
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 progressive
            prec = data[0]
            if prec != 8:
                raise NotImplementedError(f"jpeg: precision {prec}")
            h, w = struct.unpack(">HH", data[1:5])
            nc = data[5]
            for i in range(nc):
                cid, sf, tq = data[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "h": sf >> 4, "v": sf & 0xF, "tq": tq})
            progressive = marker == 0xC2
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(f"jpeg: SOF marker 0xFF{marker:02X} not supported")
        elif marker == 0xC4:  # DHT
            dp = 0
            while dp < len(data):
                tc, th = data[dp] >> 4, data[dp] & 0xF
                bits = list(data[dp + 1 : dp + 17])
                n = sum(bits)
                vals = list(data[dp + 17 : dp + 17 + n])
                huff[(tc, th)] = _build_decode_map(bits, vals)
                dp += 17 + n
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", data[:2])
        elif marker == 0xDA:  # SOS
            if progressive:
                # hand the whole multi-scan tail to the progressive decoder
                return _decode_progressive(
                    buf, pos, qts, huff, comps, h, w, restart_interval
                )
            ns = data[0]
            sel = {}
            for i in range(ns):
                cs, tt = data[1 + 2 * i : 3 + 2 * i]
                sel[cs] = (tt >> 4, tt & 0xF)
            for comp in comps:
                comp["dc"], comp["ac"] = sel[comp["id"]]
            scan_pos = pos + 2 + length
            break
        pos += 2 + length
    if scan_pos is None or not comps:
        raise ValueError("jpeg: missing SOS/SOF")

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    for comp in comps:
        comp["bw"] = mcus_x * comp["h"]  # blocks per line
        comp["bh"] = mcus_y * comp["v"]
        comp["coef"] = np.zeros((comp["bh"] * comp["bw"], 8, 8), dtype=np.float64)
        comp["pred"] = 0

    r = _BitReader(buf, scan_pos)
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                r.align_restart()
                for comp in comps:
                    comp["pred"] = 0
            mcu_count += 1
            for comp in comps:
                dc_tab = huff[(0, comp["dc"])]
                ac_tab = huff[(1, comp["ac"])]
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        zz = np.zeros(64, dtype=np.int64)
                        size = _decode_huff(r, dc_tab)
                        diff = _extend(r.read_bits(size), size) if size else 0
                        comp["pred"] += diff
                        zz[0] = comp["pred"]
                        k = 1
                        while k < 64:
                            sym = _decode_huff(r, ac_tab)
                            if sym == 0x00:  # EOB
                                break
                            if sym == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += sym >> 4
                            size = sym & 0xF
                            if k > 63:
                                raise ValueError("jpeg: AC index overrun")
                            zz[k] = _extend(r.read_bits(size), size)
                            k += 1
                        bidx = (my * comp["v"] + by) * comp["bw"] + (mx * comp["h"] + bx)
                        nat = np.empty(64, dtype=np.int64)
                        nat[ZIGZAG] = zz
                        comp["coef"][bidx] = nat.reshape(8, 8) * qts[comp["tq"]].reshape(8, 8)

    return _planes_to_rgb(comps, h, w, hmax, vmax)


def _planes_to_rgb(comps: list[dict], h: int, w: int, hmax: int, vmax: int) -> np.ndarray:
    """Dequantized per-component coefficient blocks → (h, w, 3) uint8 RGB
    (IDCT, replication chroma upsample, BT.601) — shared by the baseline
    and progressive decode paths."""
    planes = []
    for comp in comps:
        sp = _idct_blocks(comp["coef"])  # (nblocks, 8, 8)
        grid = sp.reshape(comp["bh"], comp["bw"], 8, 8).transpose(0, 2, 1, 3)
        plane = grid.reshape(comp["bh"] * 8, comp["bw"] * 8)
        # replication upsample to full resolution, then crop
        ry, rx = vmax // comp["v"], hmax // comp["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        y = np.clip(planes[0], 0, 255).astype(np.uint8)
        return np.repeat(y[:, :, None], 3, axis=2)
    if len(planes) != 3:
        raise NotImplementedError(f"jpeg: {len(planes)}-component images not supported")
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r_ = y + 1.402 * cr
    g_ = y - 0.344136 * cb - 0.714136 * cr
    b_ = y + 1.772 * cb
    rgb = np.stack([r_, g_, b_], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# Progressive DCT (SOF2, T.81 Annex G) — round 5
# ---------------------------------------------------------------------------


def _next_marker(buf: bytes, pos: int) -> int:
    """First real marker at/after pos (skips stuffed FF00 and RSTn)."""
    while pos + 1 < len(buf):
        if buf[pos] == 0xFF and buf[pos + 1] != 0x00 and not (
            0xD0 <= buf[pos + 1] <= 0xD7
        ):
            return pos
        pos += 1
    return len(buf)


def _dec_ac_first(r: _BitReader, ac_tab: dict, zz: np.ndarray, ss: int, se: int,
                  al: int, eobrun: int) -> int:
    """One block of an AC FIRST scan (Ah=0): spectral band [ss, se],
    values scaled by 2^al; EOBn runs skip whole blocks."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        sym = _decode_huff(r, ac_tab)
        rr, s = sym >> 4, sym & 0xF
        if s == 0:
            if rr == 15:  # ZRL
                k += 16
                continue
            eobrun = (1 << rr) + (r.read_bits(rr) if rr else 0) - 1
            break
        k += rr
        if k > se:
            raise ValueError("jpeg: AC band overrun in progressive scan")
        zz[k] = _extend(r.read_bits(s), s) << al
        k += 1
    return eobrun


def _dec_ac_refine(r: _BitReader, ac_tab: dict, zz: np.ndarray, ss: int, se: int,
                   al: int, eobrun: int) -> int:
    """One block of an AC REFINEMENT scan (Ah=Al+1): newly-nonzero coefs of
    magnitude 2^al plus one correction bit for every history coefficient
    (the libjpeg decode_mcu_AC_refine structure)."""
    p1 = 1 << al

    def correct(k: int) -> None:
        if r.read_bit() and (zz[k] & p1) == 0:
            zz[k] += p1 if zz[k] > 0 else -p1

    k = ss
    if eobrun == 0:
        while k <= se:
            sym = _decode_huff(r, ac_tab)
            rr, s = sym >> 4, sym & 0xF
            val = 0
            if s:
                if s != 1:
                    raise ValueError("jpeg: refinement size must be 1")
                val = p1 if r.read_bit() else -p1
            elif rr != 15:
                eobrun = (1 << rr) + (r.read_bits(rr) if rr else 0)
                break
            # advance over rr zero-history coefs (correcting history ones),
            # then place val at the next zero-history position
            while k <= se:
                if zz[k] != 0:
                    correct(k)
                else:
                    if rr == 0:
                        if val:
                            zz[k] = val
                        k += 1
                        break
                    rr -= 1
                k += 1
    if eobrun > 0:
        while k <= se:
            if zz[k] != 0:
                correct(k)
            k += 1
        eobrun -= 1
    return eobrun


def _decode_progressive(
    buf: bytes,
    pos: int,
    qts: dict,
    huff: dict,
    comps: list[dict],
    h: int,
    w: int,
    restart_interval: int,
) -> np.ndarray:
    """Multi-scan progressive tail: accumulate integer zigzag coefficients
    across DC/AC first + refinement scans, then dequantize + IDCT once."""
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    for comp in comps:
        comp["bw"] = mcus_x * comp["h"]
        comp["bh"] = mcus_y * comp["v"]
        # true (unpadded-to-MCU) block grid for non-interleaved scans
        comp["cw"] = (-(-w * comp["h"] // hmax) + 7) // 8
        comp["ch"] = (-(-h * comp["v"] // vmax) + 7) // 8
        comp["zz"] = np.zeros((comp["bh"] * comp["bw"], 64), dtype=np.int64)
    by_id = {c["id"]: c for c in comps}

    while pos + 4 <= len(buf):
        if buf[pos] != 0xFF:
            pos = _next_marker(buf, pos)
            continue
        marker = buf[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (length,) = struct.unpack(">H", buf[pos + 2 : pos + 4])
        data = buf[pos + 4 : pos + 2 + length]
        if marker == 0xC4:  # DHT between scans
            dp = 0
            while dp < len(data):
                tc, th = data[dp] >> 4, data[dp] & 0xF
                bits = list(data[dp + 1 : dp + 17])
                n = sum(bits)
                huff[(tc, th)] = _build_decode_map(bits, list(data[dp + 17 : dp + 17 + n]))
                dp += 17 + n
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack(">H", data[:2])
        elif marker == 0xDA:  # one scan
            ns = data[0]
            scan = [by_id[data[1 + 2 * i]] for i in range(ns)]
            tabs = [(data[2 + 2 * i] >> 4, data[2 + 2 * i] & 0xF) for i in range(ns)]
            ss, se, a = data[1 + 2 * ns], data[2 + 2 * ns], data[3 + 2 * ns]
            ah, al = a >> 4, a & 0xF
            r = _BitReader(buf, pos + 2 + length)
            eobrun = 0
            preds = [0] * ns
            unit = 0  # MCUs (interleaved) or blocks (single-comp scan)
            if ss == 0 and ns == 1:
                # T.81 A.2.2: a single-component scan is NON-interleaved —
                # raster order over the component's own cw×ch block grid
                # (MCU padding blocks excluded), even for DC scans
                comp = scan[0]
                dc_tab = huff.get((0, tabs[0][0]))
                for by in range(comp["ch"]):
                    for bx in range(comp["cw"]):
                        if restart_interval and unit and unit % restart_interval == 0:
                            r.align_restart()
                            preds = [0] * ns
                        unit += 1
                        bidx = by * comp["bw"] + bx
                        if ah == 0:
                            size = _decode_huff(r, dc_tab)
                            diff = _extend(r.read_bits(size), size) if size else 0
                            preds[0] += diff
                            comp["zz"][bidx, 0] = preds[0] << al
                        elif r.read_bit():
                            comp["zz"][bidx, 0] |= 1 << al
            elif ss == 0:  # DC scan — interleaved over MCUs
                for my in range(mcus_y):
                    for mx in range(mcus_x):
                        if restart_interval and unit and unit % restart_interval == 0:
                            r.align_restart()
                            preds = [0] * ns
                        unit += 1
                        for si, comp in enumerate(scan):
                            for by in range(comp["v"]):
                                for bx in range(comp["h"]):
                                    bidx = (my * comp["v"] + by) * comp["bw"] + (
                                        mx * comp["h"] + bx
                                    )
                                    if ah == 0:
                                        size = _decode_huff(r, huff[(0, tabs[si][0])])
                                        diff = _extend(r.read_bits(size), size) if size else 0
                                        preds[si] += diff
                                        comp["zz"][bidx, 0] = preds[si] << al
                                    elif r.read_bit():
                                        comp["zz"][bidx, 0] |= 1 << al
            else:  # AC scan — single component, its own block raster
                if ns != 1:
                    raise ValueError("jpeg: progressive AC scan must be single-component")
                comp = scan[0]
                ac_tab = huff[(1, tabs[0][1])]
                dec = _dec_ac_first if ah == 0 else _dec_ac_refine
                for by in range(comp["ch"]):
                    for bx in range(comp["cw"]):
                        if restart_interval and unit and unit % restart_interval == 0:
                            r.align_restart()
                            eobrun = 0
                        unit += 1
                        eobrun = dec(
                            r, ac_tab, comp["zz"][by * comp["bw"] + bx], ss, se, al, eobrun
                        )
            pos = _next_marker(buf, r.pos)
            continue
        pos += 2 + length

    for comp in comps:
        nat = np.zeros((comp["zz"].shape[0], 64), dtype=np.float64)
        nat[:, ZIGZAG] = comp["zz"]
        comp["coef"] = (nat * qts[comp["tq"]][None, :]).reshape(-1, 8, 8)
    return _planes_to_rgb(comps, h, w, hmax, vmax)


def _enc_ac_first_block(t: np.ndarray, ac_codes: dict, w: _BitWriter) -> None:
    """AC FIRST-scan block body for band values t (already point-
    transformed); EOB0-only (std tables define no EOBn>0 symbols)."""
    nz = np.nonzero(t)[0]
    last = int(nz[-1]) + 1 if len(nz) else 0
    run = 0
    for k in range(last):
        v = int(t[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, l = ac_codes[0xF0]
            w.write(c, l)
            run -= 16
        size = _bit_size(v)
        c, l = ac_codes[(run << 4) | size]
        w.write(c, l)
        w.write(v if v > 0 else v + (1 << size) - 1, size)
        run = 0
    if last < len(t):
        c, l = ac_codes[0x00]
        w.write(c, l)


def _enc_ac_refine_block(v: np.ndarray, ac_codes: dict, w: _BitWriter, al: int) -> None:
    """AC REFINEMENT block body, emitted in exact position-sync with the
    decoder's advance: each symbol is followed by the correction bits of
    PRECISELY the history positions its advance passes — a ZRL covers
    history bits only up to its 16th zero-history position (flushing all
    pending bits there would desync the decoder's next Huffman read)."""
    p1 = 1 << al
    t = np.fix(v / p1).astype(np.int64)  # truncation toward zero (G.1.2.2)
    hist = np.fix(v / (p1 << 1)).astype(np.int64) != 0
    n = len(v)
    newpos = [k for k in range(n) if not hist[k] and t[k] != 0]

    def corr_bits(a: int, b: int) -> None:  # history bits for positions [a, b)
        for k in range(a, b):
            if hist[k]:
                w.write(int(abs(int(t[k]))) & 1, 1)

    ptr = 0
    for np_ in newpos:
        zeros = [k for k in range(ptr, np_) if not hist[k] and t[k] == 0]
        while len(zeros) > 15:
            c, l = ac_codes[0xF0]  # ZRL: decoder passes 16 zero-history slots
            w.write(c, l)
            corr_bits(ptr, zeros[15] + 1)
            ptr = zeros[15] + 1
            zeros = zeros[16:]
        c, l = ac_codes[(len(zeros) << 4) | 1]
        w.write(c, l)
        w.write(1 if t[np_] > 0 else 0, 1)
        corr_bits(ptr, np_)
        ptr = np_ + 1
    if ptr < n:
        c, l = ac_codes[0x00]  # EOB covers the tail's history corrections
        w.write(c, l)
        corr_bits(ptr, n)


def encode_jpeg_progressive(img: np.ndarray, quality: int = 85, al: int = 1) -> bytes:
    """(h, w, 3) uint8 RGB → progressive (SOF2) JFIF bytes, 4:4:4.

    Scan script exercises BOTH progressive mechanisms: spectral selection
    (DC and AC in separate scans, per-component AC scans) and successive
    approximation (first pass at point transform ``al``, then DC and AC
    refinement scans down to full precision). Quantized coefficients are
    identical to :func:`encode_jpeg` at the same quality, so the decoded
    image must match the baseline encoding bit-for-bit (test-pinned)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = np.repeat(img[:, :, None], 3, axis=2)
    h, w, c = img.shape
    if c != 3:
        raise ValueError(f"encode_jpeg_progressive expects (h, w, 3), got {img.shape}")
    if al != 1:
        # one refinement pass per band is emitted, so only al=1 reaches full
        # precision; deeper scan cascades are not implemented (explicit
        # guard — an al>1 stream would desync the decoder)
        raise ValueError("encode_jpeg_progressive supports al=1 only")
    luma_qt = _quality_scaled(STD_LUMA_QT, quality)
    chroma_qt = _quality_scaled(STD_CHROMA_QT, quality)
    ycc = _rgb_to_ycbcr(img)
    qts = [luma_qt, chroma_qt, chroma_qt]
    zz = []
    for ci in range(3):
        b = _to_blocks(ycc[..., ci])
        zz.append(_fdct_quant(b, qts[ci]).reshape(b.shape[0], b.shape[1], 64))
    gh, gw = zz[0].shape[:2]

    dc_codes = [_build_codes(DC_LUMA_BITS, DC_LUMA_VALS),
                _build_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)]
    ac_codes = [_build_codes(AC_LUMA_BITS, AC_LUMA_VALS),
                _build_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)]

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    def sos(comp_ids: list[int], ss: int, se: int, ah: int, al_: int) -> bytes:
        p = bytes([len(comp_ids)])
        for cid in comp_ids:
            t = 0 if cid == 1 else 1
            p += bytes([cid, (t << 4) | t])
        return seg(0xFFDA, p + bytes([ss, se, (ah << 4) | al_]))

    out = bytearray(b"\xff\xd8")
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xFFDB, bytes([0]) + bytes(luma_qt[ZIGZAG].tolist()))
    out += seg(0xFFDB, bytes([1]) + bytes(chroma_qt[ZIGZAG].tolist()))
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([3])
    for ci in range(3):
        sof += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])
    out += seg(0xFFC2, sof)  # SOF2: progressive DCT
    for cls, tid, bits, vals in (
        (0, 0, DC_LUMA_BITS, DC_LUMA_VALS),
        (1, 0, AC_LUMA_BITS, AC_LUMA_VALS),
        (0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS),
        (1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS),
    ):
        out += seg(0xFFC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))

    # scan 1: DC first, interleaved, point transform al (arithmetic shift)
    out += sos([1, 2, 3], 0, 0, 0, al)
    wtr = _BitWriter()
    prev = [0, 0, 0]
    for by in range(gh):
        for bx in range(gw):
            for ci in range(3):
                t0 = int(zz[ci][by, bx, 0]) >> al
                diff = t0 - prev[ci]
                prev[ci] = t0
                size = _bit_size(diff)
                code, length = dc_codes[0 if ci == 0 else 1][size]
                wtr.write(code, length)
                if size:
                    wtr.write(diff if diff > 0 else diff + (1 << size) - 1, size)
    out += wtr.flush()

    # scans 2-4: AC first per component (band 1..63, divide-truncate by 2^al)
    for ci in range(3):
        out += sos([ci + 1], 1, 63, 0, al)
        wtr = _BitWriter()
        codes = ac_codes[0 if ci == 0 else 1]
        for by in range(gh):
            for bx in range(gw):
                t = np.fix(zz[ci][by, bx, 1:] / (1 << al)).astype(np.int64)
                _enc_ac_first_block(t, codes, wtr)
        out += wtr.flush()

    # scan 5: DC refinement — one raw bit per block per component
    out += sos([1, 2, 3], 0, 0, al, al - 1) if al > 1 else sos([1, 2, 3], 0, 0, al, 0)
    wtr = _BitWriter()
    for by in range(gh):
        for bx in range(gw):
            for ci in range(3):
                wtr.write(int(zz[ci][by, bx, 0]) & 1, 1)
    out += wtr.flush()

    # scans 6-8: AC refinement per component down to full precision
    for ci in range(3):
        out += sos([ci + 1], 1, 63, al, al - 1) if al > 1 else sos([ci + 1], 1, 63, al, 0)
        wtr = _BitWriter()
        codes = ac_codes[0 if ci == 0 else 1]
        for by in range(gh):
            for bx in range(gw):
                _enc_ac_refine_block(zz[ci][by, bx, 1:], codes, wtr, 0)
        out += wtr.flush()

    out += b"\xff\xd9"
    return bytes(out)
