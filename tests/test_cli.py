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
