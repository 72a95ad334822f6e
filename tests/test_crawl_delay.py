"""Robots Crawl-delay enforcement: the parsed per-host delay caps the
per-round budget at floor(round_window / delay) (north-rule politeness;
the reference has no robots handling at all, so this is twin-checked by
invariants + completeness rather than reference parity)."""

from __future__ import annotations

import pytest

from pushkind_crawlers_spark.operators.budget import parse_robots_full_py
from pushkind_crawlers_spark.oracle import OracleCrawler
from pushkind_crawlers_spark.plans.crawl import CrawlEngine
from pushkind_crawlers_spark.synth.worldgen import SyntheticWorld, WorldConfig

WINDOW_S = 1.0


@pytest.fixture(scope="module")
def delay_world() -> SyntheticWorld:
    # pick a seed whose hosts include nonzero crawl delays
    for seed in range(1, 50):
        world = SyntheticWorld(WorldConfig(
            seed=seed, n_hosts=3, hot_factor=1,
            categories_range=(2, 3), pages_range=(1, 2),
            links_per_page=(3, 5), images_per_product=(0, 0),
            budget_scale=6,
        ))
        delays = [world.host_config(h).crawl_delay_ms for h in world.cfg.hosts()]
        if any(d >= 500 for d in delays) and any(d == 0 for d in delays):
            return world
    raise AssertionError("no seed produced the wanted delay mix")


def test_crawl_delay_parsed_from_robots(delay_world):
    for h in delay_world.cfg.hosts():
        hc = delay_world.host_config(h)
        prefixes, delay = parse_robots_full_py(delay_world.robots_txt(h))
        assert prefixes == hc.robots_disallow
        if hc.crawl_delay_ms:
            assert delay == pytest.approx(hc.crawl_delay_ms / 1000.0)
        else:
            assert delay is None


def test_crawl_delay_caps_per_round_budget(spark, delay_world, tmp_path):
    eng = CrawlEngine(spark, delay_world, str(tmp_path / "d"),
                      round_window_s=WINDOW_S)
    eng.run()
    budgets = {h: delay_world.host_config(h).budget_per_round
               for h in delay_world.cfg.hosts()}
    delays = {h: delay_world.host_config(h).crawl_delay_ms / 1000.0
              for h in delay_world.cfg.hosts()}
    per_round = (
        eng.store.table("crawl_order").read(spark)
        .groupBy("round", "host").count().collect()
    )
    capped_seen = False
    for r in per_round:
        cap = budgets[r["host"]]
        if delays[r["host"]] > 0:
            # floor of the IEEE division, like the engine (note: python's
            # // is exact-floor and gives 9 for 1.0//0.1 — not this)
            import math
            cap = min(cap, max(1, math.floor(WINDOW_S / delays[r["host"]])))
            if cap < budgets[r["host"]]:
                capped_seen = True
        assert r["count"] <= cap, (r["round"], r["host"], r["count"], cap)
    assert capped_seen, "no host was actually delay-capped — vacuous test"

    # completeness: the cap slows rounds, never drops coverage
    oracle = OracleCrawler(delay_world).run()
    got_seen = {r["url"] for r in eng.store.table("seen").read(spark).collect()}
    assert got_seen == set(oracle.seen)
