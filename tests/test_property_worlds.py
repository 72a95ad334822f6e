"""Property-based-ish parity (SURVEY §5.5): randomized seeded world
shapes, engine vs oracle, asserting the crawl invariants hold for every
shape — not just the fixtures the engine was developed against."""

from __future__ import annotations

import pytest

from pushkind_crawlers_spark.oracle import OracleCrawler
from pushkind_crawlers_spark.plans.crawl import CrawlEngine
from pushkind_crawlers_spark.synth.worldgen import SyntheticWorld, WorldConfig

SHAPES = [
    # deep pagination, no variants, skewed hot host, robots on
    WorldConfig(seed=23, n_hosts=3, hot_factor=4, categories_range=(1, 2),
                pages_range=(3, 4), links_per_page=(3, 6),
                images_per_product=(0, 0), budget_scale=6,
                variant_fraction=0.0, robots_fraction=0.2),
    # variant-heavy single host, dup-dense links, invalid rows
    WorldConfig(seed=31, n_hosts=1, categories_range=(2, 2),
                pages_range=(1, 2), links_per_page=(5, 9),
                images_per_product=(0, 0), budget_scale=8,
                variant_host_idx=0, variant_fraction=0.6,
                dup_fraction=0.5, invalid_fraction=0.15),
]


@pytest.mark.parametrize("cfg", SHAPES, ids=["deep-skew-robots", "variant-dup-heavy"])
def test_world_shape_parity_and_invariants(spark, tmp_path, cfg):
    world = SyntheticWorld(cfg)
    eng = CrawlEngine(spark, world, str(tmp_path / f"w{cfg.seed}"))
    eng.run()
    oracle = OracleCrawler(world).run()

    order = eng.store.table("crawl_order").read(spark).orderBy("seq").collect()
    # exact ordering parity
    assert [r["url"] for r in order] == [o["url"] for o in oracle.order]
    # seen-set parity
    seen = {r["url"]: r["discovered_round"]
            for r in eng.store.table("seen").read(spark).collect()}
    assert seen == oracle.seen
    # invariant: no URL fetched twice
    urls = [r["url"] for r in order]
    assert len(urls) == len(set(urls))
    # invariant: politeness never exceeded in any round
    budgets = {r["host"]: r["budget_per_round"] for r in world.politeness_rows()}
    per_round_host: dict = {}
    for r in order:
        k = (r["round"], r["host"])
        per_round_host[k] = per_round_host.get(k, 0) + 1
    for (rnd, host), n in per_round_host.items():
        assert n <= budgets[host], (rnd, host, n)
    # results parity (count + url multiset)
    got_urls = sorted(r["url"] for r in eng.store.table("results").read(spark).collect())
    want_urls = sorted(r["url"] for r in oracle.results)
    assert got_urls == want_urls
