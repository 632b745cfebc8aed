"""Shared fixtures. Ray is initialised ONCE per pytest session."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# keep freed memory in-process: on this lazily-backed sandbox VM fresh
# anonymous pages fault at MB/s (see bench._allocator_env); harmless on
# healthy hosts, must be set before ray.init so workers inherit it
os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "1073741824")
os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "1073741824")
os.environ.setdefault("ARROW_DEFAULT_MEMORY_POOL", "system")

# THP off before ray.init (inherited by raylet + workers): this host's
# huge-page fault path can degrade to MB/s while 4 KiB faults stay
# healthy — see informationretrieval_en_people_cn_ray/hostmem.py
from informationretrieval_en_people_cn_ray.hostmem import disable_thp

disable_thp()


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield ray
    ray.shutdown()
