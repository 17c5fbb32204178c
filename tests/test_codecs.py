"""Codec unit tests: bit-exactness vs audioop, SNR invariant, tolerance."""

import numpy as np
import pytest

from data_quality_ray.functions import codecs


def test_g711_bit_exact_vs_audioop():
    audioop = pytest.importorskip("audioop")
    pcm = np.arange(-32768, 32768, dtype=np.int16)
    assert np.array_equal(
        np.frombuffer(audioop.lin2ulaw(pcm.tobytes(), 2), dtype=np.uint8),
        codecs.ulaw_encode(pcm),
    )
    assert np.array_equal(
        np.frombuffer(audioop.lin2alaw(pcm.tobytes(), 2), dtype=np.uint8),
        codecs.alaw_encode(pcm),
    )
    b = np.arange(256, dtype=np.uint8)
    assert np.array_equal(
        np.frombuffer(audioop.ulaw2lin(b.tobytes(), 2), dtype=np.int16),
        codecs.ulaw_decode(b),
    )
    assert np.array_equal(
        np.frombuffer(audioop.alaw2lin(b.tobytes(), 2), dtype=np.int16),
        codecs.alaw_decode(b),
    )


@pytest.mark.parametrize("codec", codecs.CODECS)
@pytest.mark.parametrize("sr", [8000, 16000])
def test_roundtrip_snr_at_least_30db(codec, sr):
    """Per-row invariant from BASELINE.json input_hint: SNR >= 30 dB."""
    t = np.arange(sr, dtype=np.float64) / sr
    sig = 0.5 * np.sin(2 * np.pi * 317 * t) + 0.2 * np.sin(2 * np.pi * 700 * t)
    pcm = (sig * 32767).astype(np.int16)
    ref = pcm.astype(np.float32) / 32768.0
    dec = codecs.decode_tolerant(codecs.encode(pcm, codec, sr), codec, sr)
    assert dec is not None and len(dec) == len(ref)
    assert codecs.snr_db(ref, dec) >= 30.0


@pytest.mark.parametrize("codec", codecs.CODECS)
def test_corrupt_payloads_return_none(codec):
    assert codecs.decode_tolerant(b"", codec, 16000) is None
    assert codecs.decode_tolerant(b"x", "pcm16", 16000) is None  # odd length
    assert codecs.decode_tolerant(b"RIFFxxxxWAVE", "wav", 16000) is None
    assert codecs.decode_tolerant(bytes(13), "wav", 16000) is None
    assert codecs.decode_tolerant(b"ab", "nosuch", 16000) is None


def test_wav_roundtrip_header():
    pcm = np.arange(-100, 100, dtype=np.int16)
    buf = codecs.wav_encode(pcm, 8000)
    out = codecs.wav_decode(buf)
    assert out is not None
    dec, sr = out
    assert sr == 8000
    assert np.array_equal(dec, pcm)


from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays


@settings(max_examples=50, deadline=None)
@given(arrays(np.int16, st.integers(1, 400)))
def test_g711_encode_idempotent_after_roundtrip(pcm):
    """enc(dec(enc(x))) == enc(x): one quantization, then stable."""
    for enc, dec in ((codecs.ulaw_encode, codecs.ulaw_decode),
                     (codecs.alaw_encode, codecs.alaw_decode)):
        e1 = enc(pcm)
        e2 = enc(dec(e1))
        assert np.array_equal(e1, e2)


@settings(max_examples=50, deadline=None)
@given(arrays(np.int16, st.integers(1, 400)), st.sampled_from(codecs.CODECS))
def test_decode_never_raises_and_bounded(pcm, codec):
    buf = codecs.encode(pcm, codec, 8000)
    out = codecs.decode_tolerant(buf, codec, 8000)
    assert out is not None
    assert len(out) == len(pcm)
    assert np.isfinite(out).all()
    assert (np.abs(out) <= 1.0).all()


@settings(max_examples=60, deadline=None)
@given(st.binary(max_size=64), st.sampled_from(codecs.CODECS))
def test_decode_arbitrary_bytes_never_raises(buf, codec):
    out = codecs.decode_tolerant(buf, codec, 16000)
    if out is not None:
        assert np.isfinite(out).all()


def test_adpcm_roundtrip_snr():
    """IMA ADPCM (extension codec): decode(encode(x)) tracks x at ≥ 20 dB
    SNR for band-limited audio, exact length, and tolerant-decode wiring."""
    import numpy as np

    from data_quality_ray.functions import codecs

    t = np.arange(16000) / 16000.0
    pcm = (
        (0.45 * np.sin(2 * np.pi * 220 * t) + 0.2 * np.sin(2 * np.pi * 880 * t))
        * 32767
    ).astype(np.int16)
    buf = codecs.encode(pcm, "adpcm", 16000)
    assert len(buf) < len(pcm) * 2 * 0.6  # ~4:1 compression vs pcm16
    dec = codecs.decode_tolerant(buf, "adpcm", 16000)
    assert dec is not None and len(dec) == len(pcm)
    snr = codecs.snr_db(pcm / 32768.0, dec)
    assert snr >= 20.0, f"adpcm SNR {snr:.1f} dB"
    # odd-length payload path
    buf2 = codecs.encode(pcm[:999], "adpcm", 16000)
    dec2 = codecs.decode_tolerant(buf2, "adpcm", 16000)
    assert dec2 is not None and len(dec2) == 999
    # malformed payloads must be tolerated, not raise
    assert codecs.decode_tolerant(b"", "adpcm", 16000) is None
    assert codecs.decode_tolerant(b"\x01\x02", "adpcm", 16000) is None
    assert "adpcm" in codecs.EXTENDED_CODECS and "adpcm" not in codecs.CODECS
