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


def test_decode_image_real_codec_is_stubbed():
    with pytest.raises(NotImplementedError, match="jpeg"):
        mm.decode_image(b"\xff\xd8\xff", 4, 4, "jpeg")


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
    assert ok.sum() == 42  # i % 7 == 0 rows (8 of 50) carry the stubbed codec
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
