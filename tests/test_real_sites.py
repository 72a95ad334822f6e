"""Engine E2E over the five real stores' fixture replicas.

The last mile of "a reference user can switch": ``real_site_engine``
builds a CrawlEngine whose site dimension comes from SITE_RULES (page
params, last-page rules, per-site budgets from the reference's
concurrency constants) and whose fetch stage is the production HTTP
path (make_http_fetch_fn + host-dispatched selector parsing).  Here it
crawls fixture-served replicas of all five stores offline: BFS menu →
category → paginated listing → products, per-site pagination expansion
(teanadin PAGEN_2 via second-to-last), variant explosion from
rusteaco's product JSON, price parsing per site format, and image bytes
landed in the images table.
"""

from __future__ import annotations

from pushkind_crawlers_spark.plans.real_sites import RealSiteWorld, real_site_engine
from pushkind_crawlers_spark.plans.site_rules import SITE_RULES
from pushkind_crawlers_spark.synth.site_fixtures import build_fixture

SITES = sorted(SITE_RULES)


def _fixtures_and_transport():
    fxs = {site: build_fixture(site) for site in SITES}
    pages, images = {}, {}
    for fx in fxs.values():
        pages.update(fx.pages)
        images.update(fx.images)

    def factory():
        def get(url: str):
            if url in images:
                return images[url]
            page = pages.get(url)
            return page.encode() if page is not None else None
        return get

    return fxs, factory


def test_real_site_world_dim():
    w = RealSiteWorld(budget_scale=8)
    assert sorted(w.hosts()) == sorted(r.host for r in SITE_RULES.values())
    tn = w.host_config("teanadin.ru")
    assert tn.page_param == "PAGEN_2" and tn.last_page_rule == "second_last"
    assert tn.budget_per_round == 8            # concurrency 1 × scale
    assert w.host_config("101tea.ru").budget_per_round == 40  # concurrency 5
    assert len(w.politeness_rows()) == 5
    assert f"http://teanadin.ru/" in w.seed_urls()


def test_engine_crawls_all_five_stores(spark, tmp_path):
    fxs, factory = _fixtures_and_transport()
    eng = real_site_engine(spark, str(tmp_path / "store"),
                           transport_factory=factory, budget_scale=8)
    run = eng.run()
    assert run.rounds >= 3  # menu → category (+page2 via pagination) → products

    order = eng.store.table("crawl_order").read(spark).orderBy("seq").collect()
    crawled = [r["url"] for r in order]
    assert len(crawled) == len(set(crawled))  # first-wins dedup held
    for site, fx in fxs.items():
        # every page of every store crawled, incl. the engine-GENERATED
        # page-2 URL from the per-site pagination rule
        for u in (fx.menu_url, fx.category_url, fx.page2_url, *fx.product_urls):
            assert u in crawled, (site, u)

    results = eng.store.table("results").read(spark).collect()
    by_url = {}
    for r in results:
        by_url.setdefault(r["url"].split("#")[0], []).append(r)

    # per-site field parity through the WHOLE engine (parse → validate)
    wg = by_url[fxs["wintergreen"].product_urls[0]][0]
    assert wg.price == 1891.0 and wg.sku == "WG-001"
    assert wg.amount == 250.0 and wg.units == "г"

    gb = by_url[fxs["gutenberg"].product_urls[0]][0]
    assert gb.price == 541.0
    assert gb.amount == 150.0 and gb.units == "г"   # combined "150 г" (S2)

    tn = by_url[fxs["teanadin"].product_urls[0]][0]
    assert tn.price == 991.0
    assert tn.amount == 100.0 and tn.units == "г"   # combined "/100 г"

    t1 = by_url[fxs["101tea"].product_urls[0]][0]
    assert t1.sku == "T-101" and t1.price == 1251.0  # nth-child sku, NBSP-free

    # rusteaco product 1 explodes into its two JSON variants (#sku urls)
    rus = by_url[fxs["rusteaco"].product_urls[0]]
    assert sorted(r["url"].split("#")[1] for r in rus) == ["R-1a", "R-1b"]
    assert sorted(r.price for r in rus) == [950.0, 1800.0]
    assert {r.amount for r in rus} == {50.0, 100.0}

    # image bytes landed for the two stores whose rules carry images
    imgs = {r["image_id"]: bytes(r["bytes"])
            for r in eng.store.table("images").read(spark).collect()}
    for site in ("wintergreen", "teanadin"):
        for url, blob in fxs[site].images.items():
            image_id = url.rsplit("/", 1)[-1]
            assert imgs.get(image_id) == blob, (site, image_id)


def test_unknown_host_pages_fail_closed(spark, tmp_path):
    """A seed whose host has no rule row parses as a 404 (ok=False) and
    the crawl terminates cleanly — no rule table, no extraction."""
    fxs, factory = _fixtures_and_transport()
    rules = {"wintergreen.ru": SITE_RULES["wintergreen"]}
    eng = real_site_engine(spark, str(tmp_path / "s2"),
                           transport_factory=factory,
                           rules_by_host=rules, budget_scale=8)
    # seed list: only wintergreen is configured; crawl completes
    run = eng.run()
    assert run.rounds >= 3
    hosts = {r["host"] for r in
             eng.store.table("results").read(spark).collect()}
    assert hosts == {"wintergreen.ru"}


def test_cli_real_sites_flag(spark, tmp_path, capsys, monkeypatch):
    """`--real-sites` on the submit CLI crawls the five stores through
    the production engine (transport monkeypatched to the fixtures)."""
    import json
    import sys

    sys.path.insert(0, "/root/repo")
    import spark_submit_main as M

    _, factory = _fixtures_and_transport()
    monkeypatch.setattr(
        "pushkind_crawlers_spark.plans.real_sites.real_http_transport", factory)
    M.main(["--store", str(tmp_path / "cli-real"), "--real-sites",
            "--budget-scale", "8"], _stop_session=False)
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rounds"] >= 3
    # all five stores' fixture pages scheduled (4 pages + 1 generated page-2
    # URL per site = 25)
    assert out["urls_scheduled"] == 25


def test_robots_enforced_on_real_store_path(spark, tmp_path):
    """robots.txt flows through the production transport seam
    (http_robots_txt_fn GETs http://host/robots.txt via the same
    transport as pages): a Disallow prefix keeps the matching product
    off the frontier, visible as robots_rejected lineage."""
    fx = build_fixture("wintergreen")
    blocked = fx.product_urls[1]                      # /catalog/tea/p2/
    robots_url = f"http://{fx.rules.host}/robots.txt"
    robots = ("User-agent: bing\nDisallow: /\n\n"     # decoy section
              "User-agent: *\nDisallow: /catalog/tea/p2/\n")

    def factory():
        def get(url: str):
            if url == robots_url:
                return robots.encode()
            if url in fx.images:
                return fx.images[url]
            page = fx.pages.get(url)
            return page.encode() if page is not None else None
        return get

    eng = real_site_engine(
        spark, str(tmp_path / "rob"), transport_factory=factory,
        rules_by_host={fx.rules.host: fx.rules}, budget_scale=8)
    eng.run()
    crawled = {r["url"] for r in
               eng.store.table("crawl_order").read(spark).collect()}
    assert blocked not in crawled
    assert fx.product_urls[0] in crawled              # sibling unaffected
    lineage = eng.store.table("lineage").read(spark).collect()
    assert sum(r["robots_rejected"] for r in lineage) >= 1
    result_urls = {r["url"].split("#")[0] for r in
                   eng.store.table("results").read(spark).collect()}
    assert blocked not in result_urls


def test_real_store_resume_equals_uninterrupted(spark, tmp_path):
    """North-rule resumability on the PRODUCTION path: a real-store
    crawl stopped after round 1 and resumed by a fresh engine equals
    the uninterrupted run (order, seen, results)."""
    _, factory = _fixtures_and_transport()
    root_a = str(tmp_path / "interrupted")
    eng_a = real_site_engine(spark, root_a, transport_factory=factory,
                             budget_scale=8, run_id="rs")
    eng_a.run(max_rounds=1)
    eng_a2 = real_site_engine(spark, root_a, transport_factory=factory,
                              budget_scale=8, run_id="rs")
    eng_a2.run(resume=True)

    root_b = str(tmp_path / "straight")
    eng_b = real_site_engine(spark, root_b, transport_factory=factory,
                             budget_scale=8, run_id="rs2")
    eng_b.run()

    def snap(eng):
        return {
            "order": [(r["seq"], r["url"]) for r in
                      eng.store.table("crawl_order").read(spark)
                      .orderBy("seq").collect()],
            "seen": sorted(r["url"] for r in
                           eng.store.table("seen").read(spark).collect()),
            "results": sorted((r["url"], r["sku"], r["price"]) for r in
                              eng.store.table("results").read(spark).collect()),
        }

    a, b = snap(eng_a2), snap(eng_b)
    assert a["order"] == b["order"]
    assert a["seen"] == b["seen"]
    assert a["results"] == b["results"]
