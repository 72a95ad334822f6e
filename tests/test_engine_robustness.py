"""Engine robustness probes (verify-recipe scenarios as tests)."""

from __future__ import annotations

from pushkind_crawlers_spark.oracle import OracleCrawler
from pushkind_crawlers_spark.plans.crawl import CrawlEngine
from pushkind_crawlers_spark.synth.worldgen import SyntheticWorld, WorldConfig


def _tiny_world():
    return SyntheticWorld(WorldConfig(
        seed=5, n_hosts=1, categories_range=(1, 1), pages_range=(1, 1),
        links_per_page=(2, 3), images_per_product=(0, 0), budget_scale=10,
    ))


def test_dead_seed_no_crash(spark, tmp_path):
    """A seed that 404s everywhere: the run terminates cleanly, the
    failure is visible as fetch_errors in lineage, nothing else breaks."""
    world = _tiny_world()
    eng = CrawlEngine(spark, world, str(tmp_path / "s"),
                      seeds=["http://nowhere.test/"])
    run = eng.run()
    assert run.rounds == 1
    assert run.total_scheduled == 1
    lin = eng.store.table("lineage").read(spark).collect()
    assert sum(r["fetch_errors"] for r in lin) == 1
    assert sum(r["fetched"] for r in lin) == 0
    assert eng.store.table("results").read(spark).count() == 0


def test_mixed_dead_and_live_seeds(spark, tmp_path):
    """Dead seeds don't poison live ones; the live host crawls fully and
    still matches the oracle given the same seed list."""
    world = _tiny_world()
    seeds = ["http://nowhere.test/", "http://site0.test/"]
    eng = CrawlEngine(spark, world, str(tmp_path / "m"), seeds=seeds)
    eng.run()
    oracle = OracleCrawler(world, seeds=seeds).run()
    got = [r["url"] for r in
           eng.store.table("crawl_order").read(spark).orderBy("seq").collect()]
    assert got == [o["url"] for o in oracle.order]
    seen = {r["url"] for r in eng.store.table("seen").read(spark).collect()}
    assert seen == set(oracle.seen)


def test_targeted_refetch_f9(spark, tmp_path):
    """F9: a frontier built from an explicit URL list (no seed expansion)
    fetches exactly those product pages."""
    world = _tiny_world()
    hc = world.host_config("site0.test")
    urls = [world.product_url("site0.test", pid) for pid in range(min(3, hc.n_products))]
    eng = CrawlEngine(spark, world, str(tmp_path / "t"), seeds=urls)
    run = eng.run()
    assert run.total_scheduled == len(urls)
    order = [r["url"] for r in
             eng.store.table("crawl_order").read(spark).orderBy("seq").collect()]
    assert order == urls
    results = eng.store.table("results").read(spark).collect()
    # every valid product among the targets yields rows; no link expansion
    assert eng.store.table("frontier").read(spark).count() == 0
    assert {r["url"].split("#")[0] for r in results} <= set(urls)


def test_seen_mode_upgrade_on_resume(spark, tmp_path):
    """A store crawled partway in anti mode can be RESUMED in sidecar
    mode: the sidecar rebuilds from the committed seen table (the
    rebuild-if-empty path) and the finished crawl still equals the
    oracle — the membership structure is an implementation detail, never
    semantics."""
    world = _tiny_world()
    root = str(tmp_path / "up")
    CrawlEngine(spark, world, root, seen_mode="anti", run_id="up").run(max_rounds=1)
    eng2 = CrawlEngine(spark, world, root, seen_mode="sidecar",
                       sidecar_shards=4, run_id="up")
    eng2.run(resume=True)
    oracle = OracleCrawler(world).run()
    got = [r["url"] for r in
           eng2.store.table("crawl_order").read(spark).orderBy("seq").collect()]
    assert got == [o["url"] for o in oracle.order]
    # the upgraded run committed a live sidecar for the NEXT resume
    assert eng2.store.table("seen_sidecar").read(spark).count() > 0
