"""One place for local Ray session setup (bench.py, CLI, tests).

Only entry points own a session (__ray_entry__ contract: the driver inits
Ray before importing anything of ours).
"""

from __future__ import annotations


def init_local_session(num_cpus: int | None = None) -> None:
    import ray
    from ray.data import DataContext

    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
