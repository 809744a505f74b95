"""Session-scoped Ray init (one cluster for the whole pytest run)."""

from __future__ import annotations

import pytest
import ray


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=8,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    # default shuffle parallelism is 200 reduce partitions — far too many
    # for a small local cluster; match it to the CPU count
    ctx.min_parallelism = 8
    yield
    ray.shutdown()
