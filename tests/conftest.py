from __future__ import annotations

import pytest

from pushkind_crawlers_spark.session import get_spark
from pushkind_crawlers_spark.synth.worldgen import SyntheticWorld, WorldConfig


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app="tests", master="local[4]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def small_world() -> SyntheticWorld:
    """~70 fetchable pages, 2 hosts, variants + robots + invalid rows."""
    return SyntheticWorld(
        WorldConfig(
            seed=7,
            n_hosts=2,
            hot_factor=2,
            categories_range=(2, 3),
            pages_range=(1, 3),
            links_per_page=(4, 8),
            images_per_product=(0, 2),
            image_sizes=(32,),
            invalid_fraction=0.05,
            variant_host_idx=1,
        )
    )


@pytest.fixture(scope="session")
def mid_world() -> SyntheticWorld:
    """Bigger world with a hot host for skew tests (no images for speed)."""
    return SyntheticWorld(
        WorldConfig(
            seed=11,
            n_hosts=3,
            hot_factor=6,
            categories_range=(3, 4),
            pages_range=(1, 3),
            links_per_page=(6, 10),
            images_per_product=(0, 0),
            budget_scale=20,
        )
    )
