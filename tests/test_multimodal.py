"""Multimodal plumbing: fake-codec decode through actor-pool stages; real
codecs cleanly stubbed."""

import numpy as np
import pyarrow as pa
import pytest

from data_quality_ray.stages import multimodal as mm


def test_decode_image_fake_codec_roundtrip():
    img = np.arange(12 * 16 * 3, dtype=np.uint8).reshape(12, 16, 3)
    out = mm.decode_image(img.tobytes(), 16, 12, "fake-rgb8")
    assert np.array_equal(out, img)


def test_decode_image_native_codec_is_stubbed():
    with pytest.raises(NotImplementedError, match="webp"):
        mm.decode_image(b"RIFF....WEBP", 4, 4, "webp")


def test_decode_image_progressive_jpeg_is_stubbed():
    # SOI + SOF2 (progressive) header — the declared seam inside decode_jpeg
    import struct

    sof2 = b"\xff\xd8" + b"\xff\xc2" + struct.pack(">H", 11) + bytes([8, 0, 4, 0, 4, 1, 1, 0x11, 0])
    with pytest.raises(NotImplementedError, match="progressive"):
        mm.decode_image(sof2, 4, 4, "jpeg")


def test_decode_image_baseline_jpeg_real():
    from data_quality_ray.functions.jpeg_codec import encode_jpeg

    yy, xx = np.mgrid[0:12, 0:16]
    img = np.stack([xx * 16, yy * 20, (xx + yy) * 9], axis=-1).astype(np.uint8)
    out = mm.decode_image(encode_jpeg(img, quality=95), 16, 12, "jpeg")
    assert out.shape == (12, 16, 3)
    assert np.abs(out.astype(int) - img.astype(int)).mean() < 3.0


def test_image_feature_stage_over_ray(ray_session):
    import ray.data as rd

    tbl = mm.synth_images(50)
    out = (
        rd.from_arrow(tbl)
        .map_batches(mm.ImageFeatureStage, batch_format="pyarrow",
                     batch_size=16, concurrency=2)
        .to_pandas()
    )
    assert len(out) == 50
    ok = out["decode_ok"]
    assert ok.sum() == 42  # i % 7 == 0 rows (8 of 50) carry the stubbed webp
    decoded = out[ok]
    assert all(len(t) == 48 for t in decoded["thumb"])  # 4×4×3
    stubbed = out[~ok]
    assert all(len(t) == 0 for t in stubbed["thumb"])
    assert "bytes" not in out.columns  # payload dropped after decode


def test_frame_sample_stage_over_ray(ray_session):
    import ray.data as rd

    tbl = mm.synth_videos(6, n_frames=12)
    out = (
        rd.from_arrow(tbl)
        .map_batches(mm.FrameSampleStage, batch_format="pyarrow", concurrency=2)
        .to_pandas()
    )
    # 12 frames sampled every 4 → 3 rows per video
    assert len(out) == 6 * 3
    assert set(out["frame_idx"].unique()) == {0, 4, 8}
    assert all(len(b) == 8 * 6 * 3 for b in out["frame_bytes"])


# ---------------------------------------------------------------------------
# audio embeddings
# ---------------------------------------------------------------------------


def test_audio_embedding_codec_invariance():
    """The same waveform must embed ~identically through every codec."""
    from data_quality_ray.functions import codecs
    from data_quality_ray.stages.audio_embed import AudioEmbedStage, embed_pcm, mel_filterbank

    t = np.arange(16000) / 16000
    pcm = (0.5 * np.sin(2 * np.pi * 220 * t) + 0.2 * np.sin(2 * np.pi * 1200 * t))
    pcm16 = (pcm * 32767).astype(np.int16)
    fb = mel_filterbank()
    embs = {}
    for codec in codecs.CODECS:
        dec = codecs.decode_tolerant(codecs.encode(pcm16, codec, 16000), codec, 16000)
        embs[codec] = embed_pcm(dec, 16000, fb)
    base = embs["pcm16"]
    for codec, e in embs.items():
        cos = float(np.dot(base, e))
        assert cos > 0.999, f"{codec} cosine {cos}"
    # a different waveform embeds far away
    other = (0.5 * np.sin(2 * np.pi * 3100 * t) * 32767).astype(np.int16)
    dec = codecs.decode_tolerant(codecs.encode(other, "pcm16", 16000), "pcm16", 16000)
    assert float(np.dot(base, embed_pcm(dec, 16000, fb))) < 0.9


def test_clip_audio_embeddings_over_ray(ray_session, clips_dir_1k):
    from data_quality_ray.stages.audio_embed import N_MELS, clip_audio_embeddings

    out = clip_audio_embeddings(clips_dir_1k).to_pandas()
    assert len(out) == 1000
    ok = out[out["decode_ok"]]
    assert (ok["embedding"].map(len) == N_MELS).all()
    norms = ok["embedding"].map(lambda v: float(np.linalg.norm(v)))
    assert np.allclose(norms, 1.0, atol=1e-3)
    assert (~out[~out["decode_ok"]]["embedding"].map(len).astype(bool)).all()
