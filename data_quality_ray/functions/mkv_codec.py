"""Pure-python Matroska/WebM (EBML) demuxer + raw-video muxer.

EBML and Matroska are published open specifications (RFC 8794; the
Matroska element registry), so a container-level demux needs no native
library: variable-length-integer element IDs/sizes, a nested element
tree, Tracks metadata, and Cluster/SimpleBlock frame payloads. This
module implements exactly that container layer:

- :func:`encode_mkv_rawvideo` — mux (n, h, w, 3) uint8 frames as a
  spec-shaped Matroska segment with ``CodecID = V_UNCOMPRESSED`` (one
  SimpleBlock per frame) — the planted-container fixture.
- :func:`mkv_probe` — parse ANY Matroska/WebM buffer's container
  structure: doctype, codec id, track number, pixel dims, block count.
  This is the real demux work and runs on real mkv/webm files.
- :func:`decode_mkv` — probe + extract frames. Raw video decodes fully;
  compressed codecs (V_VP8/V_VP9/V_MPEG4/…) raise a DECLARED
  ``NotImplementedError`` naming the codec — the container demux is
  real, only the bitstream decoder needs a native library.

Reference role: the reference pipeline treats media payloads as opaque
columns (SURVEY §2.3 M4/M5 axis-normalize/clean); this extends the same
decode seam to the one container format a real video corpus hits first.
"""

from __future__ import annotations

import numpy as np

# Matroska element IDs (public registry), as full big-endian byte values
EBML_HEADER = 0x1A45DFA3
BLOCK_GROUP = 0xA0
BLOCK = 0xA1
DOCTYPE = 0x4282
SEGMENT = 0x18538067
INFO = 0x1549A966
TIMESTAMP_SCALE = 0x2AD7B1
TRACKS = 0x1654AE6B
TRACK_ENTRY = 0xAE
TRACK_NUMBER = 0xD7
TRACK_UID = 0x73C5
TRACK_TYPE = 0x83
CODEC_ID = 0x86
VIDEO = 0xE0
PIXEL_WIDTH = 0xB0
PIXEL_HEIGHT = 0xBA
CLUSTER = 0x1F43B675
CLUSTER_TIMESTAMP = 0xE7
SIMPLE_BLOCK = 0xA3

_MASTER = {EBML_HEADER, SEGMENT, INFO, TRACKS, TRACK_ENTRY, VIDEO, CLUSTER}


def _read_vint(buf: bytes, pos: int, keep_marker: bool) -> tuple[int, int]:
    """Decode one EBML variable-length integer at ``pos``. Element IDs keep
    the length-marker bits (compared as full values); sizes strip them.
    An all-ones size is the spec's UNKNOWN-size marker (RFC 8794 §6.2 —
    live-muxed streams use it for Segment/Cluster); parsing it needs
    end-scanning we do not implement, so it raises a DECLARED stub instead
    of a confusing overrun error. Returns (value, new_pos)."""
    first = buf[pos]
    if first == 0:
        raise ValueError("EBML: invalid vint (leading byte 0)")
    n = 1
    mask = 0x80
    while not first & mask:
        n += 1
        mask >>= 1
    val = first if keep_marker else first & (mask - 1)
    for b in buf[pos + 1 : pos + n]:
        val = (val << 8) | b
    if not keep_marker and val == (1 << (7 * n)) - 1:
        raise NotImplementedError(
            "mkv: unknown-size element (live-muxed stream) — needs an "
            "end-scanning demuxer not available in this environment"
        )
    return val, pos + n


def _iter_elements(buf: bytes, pos: int, end: int):
    """Yield (element_id, payload_start, payload_end) for the children of
    one master element's payload range."""
    while pos < end:
        eid, pos = _read_vint(buf, pos, keep_marker=True)
        size, pos = _read_vint(buf, pos, keep_marker=False)
        if pos + size > end:
            raise ValueError("EBML: element overruns its parent")
        yield eid, pos, pos + size
        pos += size


def _uint(buf: bytes, a: int, b: int) -> int:
    return int.from_bytes(buf[a:b], "big")


def _encode_id(eid: int) -> bytes:
    return eid.to_bytes((eid.bit_length() + 7) // 8, "big")


def _encode_size(n: int) -> bytes:
    # always the 8-byte form (legal, if not minimal): 0x01 + 7 bytes
    return bytes([0x01]) + n.to_bytes(7, "big")


def _elem(eid: int, payload: bytes) -> bytes:
    return _encode_id(eid) + _encode_size(len(payload)) + payload


def _uint_elem(eid: int, v: int) -> bytes:
    return _elem(eid, v.to_bytes(max(1, (v.bit_length() + 7) // 8), "big"))


def encode_mkv_rawvideo(frames: np.ndarray, doctype: bytes = b"matroska") -> bytes:
    """Mux (n, h, w, 3) uint8 RGB frames as a Matroska segment with
    ``V_UNCOMPRESSED`` SimpleBlocks (track 1, one keyframe block per
    frame, cluster timestamp 0, relative timestamps 0..n−1)."""
    if frames.ndim != 4 or frames.shape[3] != 3 or frames.dtype != np.uint8:
        raise ValueError("encode_mkv_rawvideo expects (n, h, w, 3) uint8")
    n, h, w, _ = frames.shape
    header = _elem(EBML_HEADER, _elem(DOCTYPE, doctype))
    info = _elem(INFO, _uint_elem(TIMESTAMP_SCALE, 1_000_000))
    track = _elem(
        TRACK_ENTRY,
        _uint_elem(TRACK_NUMBER, 1)
        + _uint_elem(TRACK_UID, 1)
        + _uint_elem(TRACK_TYPE, 1)  # video
        + _elem(CODEC_ID, b"V_UNCOMPRESSED")
        + _elem(VIDEO, _uint_elem(PIXEL_WIDTH, w) + _uint_elem(PIXEL_HEIGHT, h)),
    )
    blocks = b"".join(
        _elem(
            SIMPLE_BLOCK,
            # track number as a 1-byte vint, int16be relative ts, keyframe flag
            bytes([0x80 | 1]) + int(i).to_bytes(2, "big") + bytes([0x80])
            + frames[i].tobytes(),
        )
        for i in range(n)
    )
    cluster = _elem(CLUSTER, _uint_elem(CLUSTER_TIMESTAMP, 0) + blocks)
    segment = _elem(SEGMENT, info + _elem(TRACKS, track) + cluster)
    return header + segment


def mkv_probe(buf: bytes) -> dict:
    """Demux the container structure of a Matroska/WebM buffer: returns
    {doctype, codec_id, track_number, width, height, n_blocks, blocks}
    where blocks is the list of (track, payload bytes) of every
    SimpleBlock, in stream order. Raises ValueError on non-EBML input."""
    if len(buf) < 4 or _uint(buf, 0, 4) != EBML_HEADER:
        raise ValueError("not an EBML stream (missing 0x1A45DFA3 magic)")
    out = {
        "doctype": None,
        "codec_id": None,
        "track_number": None,
        "width": None,
        "height": None,
        "blocks": [],
    }
    for eid, a, b in _iter_elements(buf, 0, len(buf)):
        if eid == EBML_HEADER:
            for cid, ca, cb in _iter_elements(buf, a, b):
                if cid == DOCTYPE:
                    out["doctype"] = buf[ca:cb].split(b"\x00")[0].decode("ascii")
        elif eid == SEGMENT:
            _probe_segment(buf, a, b, out)
    out["n_blocks"] = len(out["blocks"])
    return out


def _probe_segment(buf: bytes, a: int, b: int, out: dict) -> None:
    for eid, ca, cb in _iter_elements(buf, a, b):
        if eid == TRACKS:
            for tid, ta, tb in _iter_elements(buf, ca, cb):
                if tid != TRACK_ENTRY:
                    continue
                ttype = None
                fields: dict = {}
                for fid, fa, fb in _iter_elements(buf, ta, tb):
                    if fid == TRACK_TYPE:
                        ttype = _uint(buf, fa, fb)
                    elif fid == TRACK_NUMBER:
                        fields["track_number"] = _uint(buf, fa, fb)
                    elif fid == CODEC_ID:
                        fields["codec_id"] = buf[fa:fb].decode("ascii")
                    elif fid == VIDEO:
                        for vid, va, vb in _iter_elements(buf, fa, fb):
                            if vid == PIXEL_WIDTH:
                                fields["width"] = _uint(buf, va, vb)
                            elif vid == PIXEL_HEIGHT:
                                fields["height"] = _uint(buf, va, vb)
                if ttype == 1 and out["track_number"] is None:  # first video track
                    out.update(fields)
        elif eid == CLUSTER:
            def _take_block(ka: int, kb: int) -> None:
                track, pos = _read_vint(buf, ka, keep_marker=False)
                pos += 3  # int16be relative timestamp + flags byte
                out["blocks"].append((track, buf[pos:kb]))

            for cid2, ka, kb in _iter_elements(buf, ca, cb):
                if cid2 == SIMPLE_BLOCK:
                    _take_block(ka, kb)
                elif cid2 == BLOCK_GROUP:  # Block-in-BlockGroup (same framing)
                    for gid, ga, gb in _iter_elements(buf, ka, kb):
                        if gid == BLOCK:
                            _take_block(ga, gb)


def decode_mkv(buf: bytes) -> np.ndarray:
    """Demux + decode a Matroska/WebM buffer to (n, h, w, 3) uint8.

    Fully decodes ``V_UNCOMPRESSED`` raw-RGB tracks (the planted-container
    fixture). Any compressed codec raises a DECLARED NotImplementedError
    naming it — the demux above it is real."""
    p = mkv_probe(buf)
    if p["codec_id"] is None or p["width"] is None:
        raise ValueError("mkv: no video track found")
    if p["codec_id"] != "V_UNCOMPRESSED":
        raise NotImplementedError(
            f"mkv codec {p['codec_id']!r}: bitstream decoder needs a native "
            "library not available in this environment (container demux OK)"
        )
    h, w = p["height"], p["width"]
    frames = [
        np.frombuffer(payload, dtype=np.uint8).reshape(h, w, 3)
        for track, payload in p["blocks"]
        if track == p["track_number"]
    ]
    if not frames:
        raise ValueError("mkv: video track has no blocks")
    return np.stack(frames)
