"""Last-page read rule (site-config matrix, SURVEY §2.6): teanadin-style
hosts read the SECOND-to-last pagination label because the block ends
with a next-page arrow (/root/reference/src/crawlers/teanadin.rs:95-99
`.rev().nth(1)`); other hosts read the last label. The world hands over
raw labels — never the ground-truth number — so the rule is load-bearing."""

from __future__ import annotations

import pytest

from pushkind_crawlers_spark.oracle import OracleCrawler
from pushkind_crawlers_spark.plans.crawl import CrawlEngine
from pushkind_crawlers_spark.synth.worldgen import SyntheticWorld, WorldConfig


@pytest.fixture(scope="module")
def five_host_world() -> SyntheticWorld:
    # 5 hosts => host idx 3 cycles onto the second_last rule (teanadin slot)
    return SyntheticWorld(
        WorldConfig(
            seed=23, n_hosts=5, hot_factor=1,
            categories_range=(1, 2), pages_range=(2, 3),
            links_per_page=(2, 4), images_per_product=(0, 0),
            budget_scale=40,
        )
    )


def test_world_pagination_label_shapes(five_host_world):
    world = five_host_world
    rules = {h: world.host_config(h).last_page_rule for h in world.cfg.hosts()}
    assert "second_last" in rules.values() and "last" in rules.values()
    checked_arrow = checked_plain = 0
    for host, rule in rules.items():
        for c in range(world.host_config(host).n_categories):
            doc = world.fetch(world.category_url(host, c))
            if doc.last_page < 2:
                assert doc.page_labels == []
                continue
            if rule == "second_last":
                assert doc.page_labels[-1] == "→"        # arrow last
                assert int(doc.page_labels[-2]) == doc.last_page
                # a naive last-label read would not even parse
                assert not doc.page_labels[-1].isdigit()
                checked_arrow += 1
            else:
                assert int(doc.page_labels[-1]) == doc.last_page
                checked_plain += 1
    assert checked_arrow > 0 and checked_plain > 0


def test_parity_with_second_last_host(spark, five_host_world, tmp_path):
    world = five_host_world
    oracle = OracleCrawler(world).run()
    engine = CrawlEngine(spark, world, str(tmp_path / "store5"))
    engine.run()
    got = [
        (r["seq"], r["url"], r["depth"], r["ord"])
        for r in engine.store.table("crawl_order").read(spark).orderBy("seq").collect()
    ]
    want = [(r["seq"], r["url"], r["depth"], r["ord"]) for r in oracle.order]
    assert got == want
    got_seen = {r["url"] for r in engine.store.table("seen").read(spark).collect()}
    assert got_seen == set(oracle.seen)
    # the second_last host's depth-2 listing pages were actually expanded
    # (the rule parsed a real number, not the arrow)
    sl_hosts = [h for h in world.cfg.hosts()
                if world.host_config(h).last_page_rule == "second_last"]
    listings = [u for _, u, d, _ in got if d == 2 and any(h in u for h in sl_hosts)]
    assert listings, "second_last host never expanded pagination"
