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
    # Raise the streaming executor's object-store budget: the default
    # reservation throttles wide-input operators (the decode stage reads
    # ~25 MB/task of clip bytes) to a fraction of the CPUs. 40% of the
    # store leaves ample headroom for shuffles and spill (measured: decode
    # concurrency cap was the flagship's utilization limiter).
    from ray.data import ExecutionResources

    store = ray.cluster_resources().get("object_store_memory", 0)
    if store:
        ctx.execution_options.resource_limits = ExecutionResources(
            object_store_memory=int(store * 0.4)
        )
