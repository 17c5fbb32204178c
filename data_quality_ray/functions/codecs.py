"""Audio codecs: pcm16 / wav / G.711 u-law / G.711 a-law, pure numpy.

Role in the graft (SURVEY.md §1.2, §2.3 M4/M5): the reference's payload
normalization (npz["x"] transpose at eeg_features.py:6-16 and nan_to_num
scrub at eeg_datasets.py:162-164) becomes a *tolerant decode* of the binary
``bytes`` column into float32 PCM in [-1, 1]. Corrupt/truncated payloads do
not raise — they return None, which maps to the reference's ``gt == -1 →
quality 0.0`` short-circuit (measure.py:23).

All kernels are vectorized numpy (no per-sample python); G.711 follows the
public ITU-T G.711 companding definition and is verified bit-exact against
CPython's ``audioop`` in tests.
"""

from __future__ import annotations

import struct

import numpy as np

CODECS = ("pcm16", "wav", "ulaw", "alaw")

_ULAW_BIAS = 0x84
_ULAW_CLIP = 32635
_ALAW_AMI = 0x55


# ---------------------------------------------------------------------------
# G.711 mu-law
# ---------------------------------------------------------------------------


_ULAW_SEG_END = np.array(
    [0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF, 0x1FFF], dtype=np.int32
)
_ALAW_SEG_END = np.array(
    [0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF], dtype=np.int32
)


def ulaw_encode(pcm: np.ndarray) -> np.ndarray:
    """int16 samples -> uint8 u-law bytes (G.711, 14-bit sox pipeline).

    Bit-exact with the classic public-domain Sun/sox implementation
    (verified against CPython ``audioop.lin2ulaw`` in tests).
    """
    v = pcm.astype(np.int16) >> 2  # arithmetic shift to 14-bit
    v = v.astype(np.int32)
    mask = np.where(v < 0, 0x7F, 0xFF).astype(np.int32)
    v = np.minimum(np.abs(v), 8159) + 33
    seg = np.searchsorted(_ULAW_SEG_END, v).astype(np.int32)
    uval = (seg << 4) | ((v >> np.minimum(seg + 1, 8)) & 0x0F)
    uval = np.where(seg >= 8, 0x7F, uval)
    return (uval ^ mask).astype(np.uint8)


def ulaw_decode(u: np.ndarray) -> np.ndarray:
    """uint8 u-law bytes -> int16 samples."""
    u = (~u.astype(np.int32)) & 0xFF
    sign = u & 0x80
    exp = (u >> 4) & 0x07
    mant = u & 0x0F
    mag = (((mant << 3) + _ULAW_BIAS) << exp) - _ULAW_BIAS
    return np.where(sign != 0, -mag, mag).astype(np.int16)


# ---------------------------------------------------------------------------
# G.711 a-law
# ---------------------------------------------------------------------------


def alaw_encode(pcm: np.ndarray) -> np.ndarray:
    """int16 samples -> uint8 a-law bytes (G.711, 13-bit sox pipeline).

    Bit-exact with the classic public-domain Sun/sox implementation
    (verified against CPython ``audioop.lin2alaw`` in tests).
    """
    v = pcm.astype(np.int16) >> 3  # arithmetic shift to 13-bit
    v = v.astype(np.int32)
    mask = np.where(v >= 0, 0xD5, 0x55).astype(np.int32)
    v = np.where(v >= 0, v, -v - 1)
    seg = np.searchsorted(_ALAW_SEG_END, v).astype(np.int32)
    shift = np.where(seg < 2, 1, seg)
    aval = (seg << 4) | ((v >> shift) & 0x0F)
    aval = np.where(seg >= 8, 0x7F, aval)
    return (aval ^ mask).astype(np.uint8)


def alaw_decode(a: np.ndarray) -> np.ndarray:
    """uint8 a-law bytes -> int16 samples."""
    a = a.astype(np.int32) ^ _ALAW_AMI
    sign = a & 0x80
    exp = (a >> 4) & 0x07
    mant = a & 0x0F
    mag = np.where(exp > 0, ((mant << 4) + 0x108) << np.maximum(exp - 1, 0), (mant << 4) + 8)
    return np.where(sign != 0, mag, -mag).astype(np.int16)


# ---------------------------------------------------------------------------
# wav (stdlib-free minimal RIFF, mono PCM16)
# ---------------------------------------------------------------------------


def wav_encode(pcm: np.ndarray, sr_hz: int) -> bytes:
    """int16 mono samples -> minimal RIFF/WAVE bytes."""
    raw = pcm.astype("<i2").tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(raw), b"WAVE", b"fmt ", 16,
        1, 1, sr_hz, sr_hz * 2, 2, 16, b"data", len(raw),
    )
    return hdr + raw


def wav_decode(buf: bytes) -> tuple[np.ndarray, int] | None:
    """RIFF/WAVE bytes -> (int16 samples, sr_hz); None if malformed."""
    if len(buf) < 44 or buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        return None
    pos, fmt, data, sr = 12, None, None, None
    while pos + 8 <= len(buf):
        cid = buf[pos : pos + 4]
        (clen,) = struct.unpack_from("<I", buf, pos + 4)
        body = buf[pos + 8 : pos + 8 + clen]
        if cid == b"fmt " and len(body) >= 16:
            fmt = struct.unpack_from("<HHIIHH", body, 0)
            sr = fmt[2]
        elif cid == b"data":
            data = body
        pos += 8 + clen + (clen & 1)
    if fmt is None or data is None or fmt[0] != 1 or fmt[5] != 16 or fmt[1] != 1:
        return None
    if len(data) % 2:
        return None
    return np.frombuffer(data, dtype="<i2"), int(sr)


# ---------------------------------------------------------------------------
# Unified encode/decode dispatch
# ---------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# IMA ADPCM (4-bit, public IMA/DVI spec) — decode-side EXTENSION codec:
# deliberately NOT in CODECS (that tuple seeds the deterministic synthetic
# clip table, which must stay byte-stable). The predictor recursion is
# data-dependent, so encode/decode are honest per-sample loops — the one
# codec here that is not vectorizable by construction; it sits at ingest
# boundaries, not in the benchmark mix.
# ---------------------------------------------------------------------------

EXTENDED_CODECS = CODECS + ("adpcm",)

_IMA_INDEX_TABLE = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int32)
_IMA_STEP_TABLE = np.array(
    [7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37, 41,
     45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173, 190,
     209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658, 724,
     796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066, 2272,
     2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894, 6484, 7132,
     7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289, 16818, 18500,
     20350, 22385, 24623, 27086, 29794, 32767], dtype=np.int32)


def adpcm_encode(pcm: np.ndarray) -> bytes:
    """int16 samples → header (predictor int16 LE, index uint8, n-parity
    uint8) + packed 4-bit IMA codes (low nibble first)."""
    pcm = np.asarray(pcm, dtype=np.int32)
    pred = int(pcm[0]) if len(pcm) else 0
    index = 0
    nibbles = bytearray()
    for s in pcm:
        step = int(_IMA_STEP_TABLE[index])
        diff = int(s) - pred
        code = 0
        if diff < 0:
            code = 8
            diff = -diff
        if diff >= step:
            code |= 4
            diff -= step
        if diff >= step >> 1:
            code |= 2
            diff -= step >> 1
        if diff >= step >> 2:
            code |= 1
        # reconstruct exactly like the decoder
        delta = (step >> 3) + ((step >> 2) if code & 1 else 0) \
            + ((step >> 1) if code & 2 else 0) + (step if code & 4 else 0)
        pred = pred - delta if code & 8 else pred + delta
        pred = max(-32768, min(32767, pred))
        index = max(0, min(88, index + int(_IMA_INDEX_TABLE[code & 7])))
        nibbles.append(code)
    first_pred = int(pcm[0]) if len(pcm) else 0
    head = struct.pack("<hBB", first_pred, 0, len(pcm) & 1)
    packed = bytearray()
    for i in range(0, len(nibbles) - 1, 2):
        packed.append(nibbles[i] | (nibbles[i + 1] << 4))
    if len(nibbles) & 1:
        packed.append(nibbles[-1])
    return head + bytes(packed)


def adpcm_decode(buf: bytes) -> np.ndarray:
    """ADPCM payload → int16 samples (inverse of :func:`adpcm_encode`)."""
    if len(buf) < 4:
        raise ValueError("adpcm: truncated header")
    pred, index, odd = struct.unpack("<hBB", buf[:4])
    if index > 88 or odd > 1:
        raise ValueError(f"adpcm: corrupt header (index={index}, parity={odd})")
    data = np.frombuffer(buf, dtype=np.uint8, offset=4)
    n = 2 * len(data) - (1 if odd else 0)
    out = np.empty(n, dtype=np.int16)
    pred = int(pred)
    index = int(index)
    for i in range(n):
        byte = data[i >> 1]
        code = (byte >> 4) if i & 1 else (byte & 0x0F)
        step = int(_IMA_STEP_TABLE[index])
        delta = (step >> 3) + ((step >> 2) if code & 1 else 0) \
            + ((step >> 1) if code & 2 else 0) + (step if code & 4 else 0)
        pred = pred - delta if code & 8 else pred + delta
        pred = max(-32768, min(32767, pred))
        index = max(0, min(88, index + int(_IMA_INDEX_TABLE[code & 7])))
        out[i] = pred
    return out


def encode(pcm: np.ndarray, codec: str, sr_hz: int) -> bytes:
    """int16 mono samples -> payload bytes for the given codec."""
    if codec == "pcm16":
        return pcm.astype("<i2").tobytes()
    if codec == "wav":
        return wav_encode(pcm, sr_hz)
    if codec == "ulaw":
        return ulaw_encode(pcm).tobytes()
    if codec == "alaw":
        return alaw_encode(pcm).tobytes()
    if codec == "adpcm":
        return adpcm_encode(pcm)
    raise ValueError(f"unknown codec {codec!r}")


def decode_tolerant(buf: bytes, codec: str, sr_hz: int) -> np.ndarray | None:
    """Payload bytes -> float32 PCM in [-1, 1], or None if undecodable.

    Tolerant: never raises on malformed payloads (reference analogue:
    measure.py:23's -1 short-circuit + eeg_datasets.py:162-164's scrub).
    NaN/inf never occur (integer sources); empty payloads are invalid.
    """
    try:
        if codec == "pcm16":
            if len(buf) == 0 or len(buf) % 2:
                return None
            pcm = np.frombuffer(buf, dtype="<i2")
        elif codec == "wav":
            out = wav_decode(buf)
            if out is None or out[1] != sr_hz:
                return None
            pcm = out[0]
        elif codec == "ulaw":
            if len(buf) == 0:
                return None
            pcm = ulaw_decode(np.frombuffer(buf, dtype=np.uint8))
        elif codec == "alaw":
            if len(buf) == 0:
                return None
            pcm = alaw_decode(np.frombuffer(buf, dtype=np.uint8))
        elif codec == "adpcm":
            pcm = adpcm_decode(buf)
        else:
            return None
    except Exception:
        return None
    if len(pcm) == 0:
        return None
    return pcm.astype(np.float32) / 32768.0


def snr_db(reference: np.ndarray, decoded: np.ndarray) -> float:
    """Signal-to-noise ratio (dB) of decoded vs reference float PCM."""
    n = min(len(reference), len(decoded))
    if n == 0:
        return float("-inf")
    ref = reference[:n].astype(np.float64)
    err = ref - decoded[:n].astype(np.float64)
    p_sig = float(np.mean(ref * ref))
    p_err = float(np.mean(err * err))
    if p_err == 0.0:
        return float("inf")
    return 10.0 * np.log10(p_sig / p_err)
