"""Session-scoped Ray fixture — Ray is initialised ONCE per pytest session."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

    from data_quality_ray.session import init_local_session

    init_local_session(num_cpus=4)
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def clips_1k():
    """1000-row deterministic clip table (local generation, no Ray)."""
    from data_quality_ray.synth.clips import generate_clips_local

    return generate_clips_local(1000)


@pytest.fixture(scope="session")
def clips_dir_1k(tmp_path_factory):
    """Clip table written as parquet files (4 shards) for pipeline tests."""
    import pyarrow.parquet as pq

    from data_quality_ray.synth.clips import generate_clips_local

    tbl = generate_clips_local(1000)
    tbl = tbl.select([c for c in tbl.column_names if not c.startswith("_")])
    d = tmp_path_factory.mktemp("clips1k")
    for i in range(4):
        pq.write_table(tbl.slice(i * 250, 250), d / f"shard-{i}.parquet")
    return str(d)
