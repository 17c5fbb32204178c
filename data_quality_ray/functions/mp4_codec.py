"""Pure-python ISO-BMFF / MP4 box-level demuxer + raw-video muxer.

The ISO base media file format (ISO/IEC 14496-12) is a published open
specification: length-prefixed fourcc boxes, a ``moov`` metadata tree
(track → media → sample table) and ``mdat`` payload bytes. Like the
Matroska module (:mod:`data_quality_ray.functions.mkv_codec`) this
implements exactly the container layer:

- :func:`encode_mp4_rawvideo` — mux (n, h, w, 3) uint8 frames as a
  minimal ftyp+moov+mdat file with a ``raw `` VisualSampleEntry, one
  chunk, per-frame ``stsz`` sizes — the planted-container fixture.
- :func:`mp4_probe` — walk ANY mp4's box tree: brands, video-track codec
  fourcc, pixel dims, and the resolved sample (offset, size) list from
  stsz/stsc/stco — the real demux work; runs on real mp4 files.
- :func:`decode_mp4` — probe + extract frames. ``raw `` tracks decode
  fully; compressed codecs (avc1/hev1/vp09/av01/…) raise a DECLARED
  ``NotImplementedError`` naming the fourcc — only the bitstream decoder
  needs a native library.
"""

from __future__ import annotations

import struct

import numpy as np

_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl", b"edts", b"dinf"}


def _iter_boxes(buf: bytes, pos: int, end: int):
    """Yield (fourcc, payload_start, payload_end) for each box in range."""
    while pos + 8 <= end:
        size = struct.unpack_from(">I", buf, pos)[0]
        typ = buf[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:  # 64-bit largesize
            size = struct.unpack_from(">Q", buf, pos + 8)[0]
            body = pos + 16
        elif size == 0:  # to end of enclosing scope
            size = end - pos
        if size < 8 or pos + size > end:
            raise ValueError(f"mp4: box {typ!r} overruns its parent")
        yield typ, body, pos + size
        pos += size


def _find(buf: bytes, a: int, b: int, fourcc: bytes):
    for typ, ba, bb in _iter_boxes(buf, a, b):
        if typ == fourcc:
            return ba, bb
    return None


def _full_box(buf: bytes, a: int) -> int:
    """Skip the version/flags word of a FullBox; returns payload start."""
    return a + 4


def encode_mp4_rawvideo(frames: np.ndarray) -> bytes:
    """Mux (n, h, w, 3) uint8 RGB frames as a minimal ISO-BMFF file:
    ``raw `` VisualSampleEntry, single chunk, one sample per frame."""
    if frames.ndim != 4 or frames.shape[3] != 3 or frames.dtype != np.uint8:
        raise ValueError("encode_mp4_rawvideo expects (n, h, w, 3) uint8")
    n, h, w, _ = frames.shape
    sample = w * h * 3

    def box(typ: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", 8 + len(payload)) + typ + payload

    def full(typ: bytes, payload: bytes) -> bytes:
        return box(typ, b"\x00\x00\x00\x00" + payload)

    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isom" + b"iso2")
    # VisualSampleEntry 'raw ': 6 reserved + dref idx, 16 predefined/reserved,
    # width, height, 72dpi h/v, reserved, frame_count=1, 32-byte name,
    # depth=24, pre_defined=-1
    vse = (
        b"\x00" * 6
        + struct.pack(">H", 1)
        + b"\x00" * 16
        + struct.pack(">HH", w, h)
        + struct.pack(">II", 0x00480000, 0x00480000)
        + b"\x00" * 4
        + struct.pack(">H", 1)
        + b"\x00" * 32
        + struct.pack(">Hh", 24, -1)
    )
    stsd = full(b"stsd", struct.pack(">I", 1) + box(b"raw ", vse))
    stts = full(b"stts", struct.pack(">III", 1, n, 1))
    stsc = full(b"stsc", struct.pack(">IIII", 1, 1, n, 1))
    stsz = full(
        b"stsz", struct.pack(">II", 0, n) + b"".join(struct.pack(">I", sample) for _ in range(n))
    )
    # stco chunk offset = absolute file offset of mdat payload; computed
    # after the moov size is known, so build moov with a placeholder first
    def build_moov(mdat_payload_off: int) -> bytes:
        stco = full(b"stco", struct.pack(">II", 1, mdat_payload_off))
        stbl = box(b"stbl", stsd + stts + stsc + stsz + stco)
        url = full(b"url ", b"")  # self-contained
        dref = full(b"dref", struct.pack(">I", 1) + url)
        dinf = box(b"dinf", dref)
        vmhd = box(b"vmhd", b"\x00\x00\x00\x01" + b"\x00" * 8)
        minf = box(b"minf", vmhd + dinf + stbl)
        hdlr = full(b"hdlr", b"\x00" * 4 + b"vide" + b"\x00" * 12 + b"raw video\x00")
        mdhd = full(b"mdhd", struct.pack(">IIIIHH", 0, 0, 1, n, 0x55C4, 0))
        mdia = box(b"mdia", mdhd + hdlr + minf)
        tkhd = full(
            b"tkhd",
            struct.pack(">III", 0, 0, 1)
            + b"\x00" * 4
            + struct.pack(">I", n)
            + b"\x00" * 8
            + struct.pack(">hhhh", 0, 0, 0, 0)
            + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
            + struct.pack(">II", w << 16, h << 16),
        )
        trak = box(b"trak", tkhd + mdia)
        mvhd = full(
            b"mvhd",
            struct.pack(">IIII", 0, 0, 1, n)
            + struct.pack(">I", 0x00010000)
            + struct.pack(">H", 0x0100)
            + b"\x00" * 10
            + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
            + b"\x00" * 24
            + struct.pack(">I", 2),
        )
        return box(b"moov", mvhd + trak)

    moov_len = len(build_moov(0))
    mdat_payload_off = len(ftyp) + moov_len + 8
    moov = build_moov(mdat_payload_off)
    assert len(moov) == moov_len
    mdat = box(b"mdat", frames.tobytes())
    return ftyp + moov + mdat


def mp4_probe(buf: bytes) -> dict:
    """Demux an ISO-BMFF buffer's structure: returns {brand, codec,
    width, height, samples} where samples is the resolved list of
    (absolute offset, size) for the first video track, from
    stsz × stsc × stco. Raises ValueError on non-BMFF input."""
    if len(buf) < 12 or buf[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF stream (missing ftyp)")
    out = {"brand": buf[8:12].decode("ascii"), "codec": None, "width": None,
           "height": None, "samples": []}
    moov = _find(buf, 0, len(buf), b"moov")
    if moov is None:
        raise ValueError("mp4: no moov box")
    for typ, ta, tb in _iter_boxes(buf, *moov):
        if typ != b"trak":
            continue
        mdia = _find(buf, ta, tb, b"mdia")
        if mdia is None:
            continue
        hdlr = _find(buf, *mdia, b"hdlr")
        if hdlr is None or buf[_full_box(buf, hdlr[0]) + 4 : _full_box(buf, hdlr[0]) + 8] != b"vide":
            continue
        minf = _find(buf, *mdia, b"minf")
        stbl = _find(buf, *minf, b"stbl") if minf else None
        if stbl is None:
            continue
        _parse_stbl(buf, stbl, out)
        break
    return out


def _parse_stbl(buf: bytes, stbl: tuple[int, int], out: dict) -> None:
    a, b = stbl
    sizes: list[int] = []
    chunk_offsets: list[int] = []
    stsc_runs: list[tuple[int, int]] = []  # (first_chunk, samples_per_chunk)
    for typ, ba, bb in _iter_boxes(buf, a, b):
        p = _full_box(buf, ba)
        if typ == b"stsd":
            entry = p + 4  # entry_count, then first sample entry box
            out["codec"] = buf[entry + 4 : entry + 8].decode("latin1")
            out["width"] = struct.unpack_from(">H", buf, entry + 32)[0]
            out["height"] = struct.unpack_from(">H", buf, entry + 34)[0]
        elif typ == b"stsz":
            uniform, count = struct.unpack_from(">II", buf, p)
            sizes = (
                [uniform] * count
                if uniform
                else list(struct.unpack_from(f">{count}I", buf, p + 8))
            )
        elif typ == b"stco":
            count = struct.unpack_from(">I", buf, p)[0]
            chunk_offsets = list(struct.unpack_from(f">{count}I", buf, p + 4))
        elif typ == b"co64":
            count = struct.unpack_from(">I", buf, p)[0]
            chunk_offsets = list(struct.unpack_from(f">{count}Q", buf, p + 4))
        elif typ == b"stsc":
            count = struct.unpack_from(">I", buf, p)[0]
            for i in range(count):
                fc, spc, _ = struct.unpack_from(">III", buf, p + 4 + 12 * i)
                stsc_runs.append((fc, spc))
    # resolve samples: walk chunks, expanding stsc runs
    samples: list[tuple[int, int]] = []
    si = 0
    for ci, off in enumerate(chunk_offsets, start=1):
        spc = 0
        for fc, n in stsc_runs:
            if fc <= ci:
                spc = n
        pos = off
        for _ in range(spc):
            if si >= len(sizes):
                break
            samples.append((pos, sizes[si]))
            pos += sizes[si]
            si += 1
    out["samples"] = samples


def decode_mp4(buf: bytes) -> np.ndarray:
    """Demux + decode an mp4 buffer to (n, h, w, 3) uint8. ``raw ``
    sample entries decode fully; compressed codecs raise a DECLARED
    NotImplementedError naming the fourcc (the demux above is real)."""
    p = mp4_probe(buf)
    if p["codec"] is None or not p["samples"]:
        raise ValueError("mp4: no video track samples found")
    if p["codec"] != "raw ":
        raise NotImplementedError(
            f"mp4 codec {p['codec']!r}: bitstream decoder needs a native "
            "library not available in this environment (container demux OK)"
        )
    h, w = p["height"], p["width"]
    frames = [
        np.frombuffer(buf[off : off + sz], dtype=np.uint8).reshape(h, w, 3)
        for off, sz in p["samples"]
    ]
    return np.stack(frames)
