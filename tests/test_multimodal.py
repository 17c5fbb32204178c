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


def test_decode_image_progressive_jpeg_real():
    # progressive (SOF2) decodes for real since round 5 — must match the
    # baseline decode of the same image exactly through the stage seam
    from data_quality_ray.functions.jpeg_codec import encode_jpeg, encode_jpeg_progressive

    yy, xx = np.mgrid[0:12, 0:16]
    img = np.stack([xx * 16, yy * 20, (xx + yy) * 9], axis=-1).astype(np.uint8)
    prog = mm.decode_image(encode_jpeg_progressive(img, quality=90), 16, 12, "jpeg")
    base = mm.decode_image(encode_jpeg(img, quality=90), 16, 12, "jpeg")
    assert np.array_equal(prog, base)


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


# ---------------------------------------------------------------------------
# Energy VAD / SNR (stages/vad.py)
# ---------------------------------------------------------------------------


class TestVad:
    def _clip_batch(self, pcms, sr=16_000):
        import pyarrow as pa

        from data_quality_ray.functions import codecs

        pcms = [np.clip(p * 32767, -32768, 32767).astype(np.int16) for p in pcms]
        return pa.table(
            {
                "clip_id": pa.array(list(range(len(pcms))), pa.int64()),
                "bytes": pa.array([codecs.encode(p, "pcm16", sr) for p in pcms]),
                "sr_hz": pa.array([sr] * len(pcms), pa.int32()),
                "codec": pa.array(["pcm16"] * len(pcms)),
            }
        )

    def test_planted_speech_span_is_found(self):
        from data_quality_ray.stages.vad import vad_stats_batch

        sr = 16_000
        rng = np.random.default_rng(7)
        noise = lambda n: 0.0005 * rng.standard_normal(n)
        tone = 0.5 * np.sin(2 * np.pi * 440 * np.arange(sr) / sr)
        pcm = np.concatenate([noise(sr // 2), tone + noise(sr), noise(int(0.3 * sr))])
        out = vad_stats_batch(self._clip_batch([pcm])).to_pylist()[0]
        assert out["decode_ok"]
        # 1 s of speech inside 1.8 s total → ratio ≈ 5556e-4; trims ≈ 500/300 ms
        assert abs(out["speech_ratio_e4"] - 5556) < 600
        assert abs(out["lead_trim_ms"] - 500) <= 40
        assert abs(out["tail_trim_ms"] - 300) <= 40
        assert out["snr_db_e2"] > 20 * 100  # tone vs -66 dB noise: SNR ≫ 20 dB

    def test_continuous_tone_is_all_speech(self):
        # homogeneous always-on clip (no silence gaps): absolute-floor path
        from data_quality_ray.stages.vad import vad_stats_batch

        sr = 16_000
        tone = 0.4 * np.sin(2 * np.pi * 220 * np.arange(sr) / sr)
        out = vad_stats_batch(self._clip_batch([tone])).to_pylist()[0]
        assert out["speech_ratio_e4"] == 10_000
        assert out["lead_trim_ms"] == 0 and out["tail_trim_ms"] == 0
        assert out["snr_db_e2"] == 120 * 100  # no noise frames → capped

    def test_silence_has_zero_speech(self):
        from data_quality_ray.stages.vad import vad_stats_batch

        pcm = np.zeros(16_000)
        out = vad_stats_batch(self._clip_batch([pcm])).to_pylist()[0]
        assert out["n_speech_frames"] == 0
        assert out["speech_ratio_e4"] == 0
        assert out["lead_trim_ms"] == out["n_frames"] * 20  # trim everything

    def test_segments_two_utterances(self):
        from data_quality_ray.stages.vad import segments_batch

        sr = 16_000
        rng = np.random.default_rng(11)
        noise = lambda ms: 0.0004 * rng.standard_normal(int(sr * ms / 1000))
        tone = lambda ms: 0.5 * np.sin(2 * np.pi * 330 * np.arange(int(sr * ms / 1000)) / sr)
        # 300ms silence | 400ms speech | 300ms pause (> MERGE_GAP) | 500ms speech
        pcm = np.concatenate([noise(300), tone(400), noise(300), tone(500)])
        out = segments_batch(self._clip_batch([pcm])).to_pylist()
        assert [r["seg_idx"] for r in out] == [0, 1]
        assert abs(out[0]["start_ms"] - 300) <= 40 and abs(out[0]["dur_ms"] - 400) <= 40
        assert abs(out[1]["start_ms"] - 1000) <= 40 and abs(out[1]["dur_ms"] - 500) <= 40
        assert all(r["seg_rms_e6"] > 100_000 for r in out)  # ~0.35 rms tones

    def test_segments_short_pause_merged(self):
        from data_quality_ray.stages.vad import segments_batch

        sr = 16_000
        rng = np.random.default_rng(12)
        noise = lambda ms: 0.0004 * rng.standard_normal(int(sr * ms / 1000))
        tone = lambda ms: 0.5 * np.sin(2 * np.pi * 330 * np.arange(int(sr * ms / 1000)) / sr)
        # 80ms pause < MERGE_GAP_MS=100 → ONE merged segment
        pcm = np.concatenate([noise(200), tone(300), noise(80), tone(300), noise(200)])
        out = segments_batch(self._clip_batch([pcm])).to_pylist()
        assert len(out) == 1
        assert abs(out[0]["dur_ms"] - 680) <= 60

    def test_segments_silence_empty(self):
        from data_quality_ray.stages.vad import segments_batch

        out = segments_batch(self._clip_batch([np.zeros(16_000)]))
        assert out.num_rows == 0

    def test_undecodable_clip_flagged_not_fatal(self):
        import pyarrow as pa

        from data_quality_ray.stages.vad import vad_stats_batch

        bad = pa.table(
            {
                "clip_id": pa.array([0], pa.int64()),
                "bytes": pa.array([b"\x00\x01"]),
                "sr_hz": pa.array([16_000], pa.int32()),
                "codec": pa.array(["wav"]),  # truncated WAV → decode None
            }
        )
        out = vad_stats_batch(bad).to_pylist()[0]
        assert not out["decode_ok"] and out["n_frames"] == 0


# ---------------------------------------------------------------------------
# MFCC featurizer (stages/mfcc.py)
# ---------------------------------------------------------------------------


def test_dct_basis_orthonormal():
    from data_quality_ray.stages.mfcc import dct_ii_orthonormal

    C = dct_ii_orthonormal(13, 40)
    assert np.allclose(C @ C.T, np.eye(13), atol=1e-12)


def test_mfcc_matches_naive_reference():
    """Strided+batched MFCC equals an independent per-frame loop."""
    from data_quality_ray.stages.audio_embed import mel_filterbank
    from data_quality_ray.stages.mfcc import (
        FRAME, HOP, N_FFT, N_MELS, N_MFCC, PREEMPH, dct_ii_orthonormal, mfcc_frames,
    )

    rng = np.random.default_rng(7)
    pcm = rng.standard_normal(16_000 * 2) * 0.1
    fb = mel_filterbank(n_mels=N_MELS, sr=16_000, n_fft=N_FFT)
    dct = dct_ii_orthonormal(N_MFCC, N_MELS)
    got = mfcc_frames(pcm, 16_000, fb, dct)

    # naive reference: explicit pre-emphasis + python frame loop
    x = np.concatenate(([pcm[0]], pcm[1:] - PREEMPH * pcm[:-1]))
    win = np.hanning(FRAME)
    want = []
    for s in range(0, len(x) - FRAME + 1, HOP):
        fr = x[s : s + FRAME] * win
        p = np.abs(np.fft.rfft(fr, n=N_FFT)) ** 2
        want.append(dct @ np.log(np.maximum(fb @ p, 1e-10)))
    want = np.array(want)
    assert got.shape == want.shape == (len(want), N_MFCC)
    assert np.allclose(got, want, atol=1e-9)


def test_mfcc_energy_ordering():
    """C0 tracks log energy: a loud clip scores higher than a quiet one."""
    from data_quality_ray.stages.audio_embed import mel_filterbank
    from data_quality_ray.stages.mfcc import N_FFT, N_MELS, N_MFCC, dct_ii_orthonormal, mfcc_frames

    t = np.arange(16_000) / 16_000
    base = np.sin(2 * np.pi * 440 * t)
    fb = mel_filterbank(n_mels=N_MELS, sr=16_000, n_fft=N_FFT)
    dct = dct_ii_orthonormal(N_MFCC, N_MELS)
    loud = mfcc_frames(0.5 * base, 16_000, fb, dct).mean(axis=0)
    quiet = mfcc_frames(0.005 * base, 16_000, fb, dct).mean(axis=0)
    assert loud[0] > quiet[0]


def test_clip_mfcc_features_over_ray(ray_session, clips_dir_1k):
    from data_quality_ray.stages.mfcc import N_MFCC, clip_mfcc_features

    out = clip_mfcc_features(clips_dir_1k).to_pandas()
    assert len(out) == 1000
    ok = out[out["decode_ok"]]
    assert len(ok) > 900
    assert (ok["mfcc_mean"].map(len) == N_MFCC).all()
    assert (ok["mfcc_std"].map(len) == N_MFCC).all()
    assert ok["mfcc_std"].map(lambda v: float(np.max(v))).gt(0).all()
    assert (~out[~out["decode_ok"]]["mfcc_mean"].map(len).astype(bool)).all()


def test_clip_multimodal_consensus_parity_verdicts(ray_session, clips_dir_1k):
    """Planted copies alternate verbatim/reworded transcripts by source-id
    parity: every even-source planted pair must read verdict 'both' (exact
    text), every odd-source pair 'audio_only' (low jaccard estimate) —
    the two-signal consensus cannot cross-contaminate."""
    import numpy as np

    from data_quality_ray.pipelines.multimodal_dedup import (
        DUP_OFFSET,
        clip_multimodal_consensus,
    )

    out = clip_multimodal_consensus(clips_dir_1k, limit=120)
    planted = out[(out["b"] - out["a"]) == DUP_OFFSET]
    assert len(planted) >= 100  # most of the 120 decode and match
    even = planted[planted["a"] % 2 == 0]
    odd = planted[planted["a"] % 2 == 1]
    assert len(even) and len(odd)
    assert (even["verdict"] == "both").all()
    assert even["text_exact"].all()
    assert (odd["verdict"] == "audio_only").all()
    assert (odd["text_jaccard_est"] < 0.5).all()
    # audio evidence present on every planted pair at the exact offset
    assert (planted["dt_frames"] == 8).all()
    assert (planted["votes"] > 0).all()
