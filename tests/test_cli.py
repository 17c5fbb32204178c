"""CLI entry point (ray job submit shape): python -m data_quality_ray.run."""

import json
import os

import pyarrow.parquet as pq


def test_cli_main_inprocess(ray_session, clips_dir_1k, tmp_path):
    """main() on an already-initialised Ray session (job-submit shape):
    must not re-init or shutdown the session."""
    import ray

    from data_quality_ray.run import main

    out = str(tmp_path / "cli")
    rc = main(["--input", clips_dir_1k, "--output", out, "--partitions", "2"])
    assert rc == 0
    assert ray.is_initialized()  # session untouched
    stats = json.load(open(os.path.join(out, "quality_stats.json")))
    assert set(stats) == {"Good", "Mid", "Bad"}
    assert sum(stats.values()) == 1000
    # rerun resumes instantly and leaves results identical
    rc = main(["--input", clips_dir_1k, "--output", out, "--partitions", "2"])
    assert rc == 0
    assert json.load(open(os.path.join(out, "quality_stats.json"))) == stats


def test_cli_render_spectrograms_requires_clips_table(ray_session, tmp_path):
    """--render-spectrograms reads clip columns; combined with --table
    documents it must fail fast (argparse error) BEFORE running anything,
    not crash after the pipeline has committed output."""
    import pytest

    from data_quality_ray.run import main

    with pytest.raises(SystemExit) as e:
        main([
            "--input", "/root/testdata/sf0.001",
            "--output", str(tmp_path / "x"),
            "--table", "documents",
            "--render-spectrograms", "3",
        ])
    assert e.value.code == 2  # argparse usage error
    assert not os.path.exists(str(tmp_path / "x"))


def test_cli_kept_only_documents(ray_session, tmp_path):
    """--kept-only must be honored for the documents table: the written
    partitions contain only keep=True rows (a strict subset)."""
    import glob

    from data_quality_ray.run import main

    src = tmp_path / "docs_in"
    src.mkdir()
    os.symlink("/root/testdata/sf0.001/documents.parquet", src / "documents.parquet")

    import pyarrow as pa

    def read_parts(root: str) -> pa.Table:
        files = sorted(glob.glob(os.path.join(root, "part=*", "*.parquet")))
        return pa.concat_tables(pq.read_table(f) for f in files)

    out_all = str(tmp_path / "docs_all")
    rc = main(["--input", str(src), "--output", out_all, "--partitions", "1",
               "--table", "documents"])
    assert rc == 0
    full = read_parts(out_all)

    out_kept = str(tmp_path / "docs_kept")
    rc = main(["--input", str(src), "--output", out_kept, "--partitions", "1",
               "--table", "documents", "--kept-only"])
    assert rc == 0
    kept = read_parts(out_kept)

    assert kept.column("keep").to_pandas().all()
    n_keep_full = int(full.column("keep").to_pandas().sum())
    assert len(kept) == n_keep_full and 0 < len(kept) < len(full)
