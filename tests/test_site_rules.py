"""Per-site extraction rule tables (VERDICT r04 next-round #1).

Layers:

* selector engine: compile/match units for the syntax the five stores'
  selectors use (tag/class/id/attr/nth-child, descendant + child);
* nested-markup text capture: full-descendant text, the round-4 advice
  regression (previous parser truncated at the first nested end tag);
* per-site parity: fixture replicas of each store's HTML shape
  (synth/site_fixtures.py) parse to the exact expected fields under the
  store's rule row from /root/reference/src/crawlers/*.rs;
* production stage: all five fixtures crawled through
  ``make_http_fetch_fn`` (mapInPandas over a transport double) —
  field-level parity inside the FETCHED rows, image bytes included;
* SSRF guards: non-http(s) schemes rejected by the transport,
  off-host image src skipped by the fetch stage.
"""

from __future__ import annotations

import pandas as pd
import pytest

from pushkind_crawlers_spark import schemas
from pushkind_crawlers_spark.plans.http_fetch import (
    make_http_fetch_fn,
    parse_site_html,
    real_http_transport,
)
from pushkind_crawlers_spark.plans.site_rules import (
    SITE_RULES,
    SYNTHETIC_RULES,
    compile_selector,
    make_multi_site_parse_fn,
    make_site_parse_fn,
    parse_with_rules,
    sel_matches,
)
from pushkind_crawlers_spark.synth.site_fixtures import (
    build_fixture,
    fixture_transport,
)

SITES = sorted(SITE_RULES)


# ---------------------------------------------------------- selector engine

def _paths(html_path):
    """Build a frame path from (tag, attrs-dict) tuples."""
    from pushkind_crawlers_spark.plans.site_rules import _Frame

    path, counters = [], [0]
    for tag, attrs in html_path:
        counters[-1] += 1
        path.append(_Frame(tag, attrs, counters[-1]))
        counters.append(0)
    return path


def test_selector_tag_class_id_attr():
    c = compile_selector("h1#pagetitle")
    assert sel_matches(c, _paths([("html", {}), ("h1", {"id": "pagetitle"})]))
    assert not sel_matches(c, _paths([("html", {}), ("h1", {"id": "other"})]))

    c = compile_selector("div[itemprop='description']")
    assert sel_matches(c, _paths([("div", {"itemprop": "description"})]))
    assert not sel_matches(c, _paths([("div", {"itemprop": "name"})]))
    assert not sel_matches(c, _paths([("div", {})]))

    c = compile_selector("a.breadcrumbs__link")
    assert sel_matches(c, _paths([("a", {"class": "breadcrumbs__link active"})]))
    assert not sel_matches(c, _paths([("a", {"class": "breadcrumbs"})]))


def test_selector_combinators():
    child = compile_selector("div.item-title > a")
    assert sel_matches(child, _paths([("div", {"class": "item-title"}), ("a", {})]))
    assert not sel_matches(
        child, _paths([("div", {"class": "item-title"}), ("span", {}), ("a", {})])
    )
    desc = compile_selector("ul.breadcrumb li a")
    assert sel_matches(
        desc, _paths([("ul", {"class": "breadcrumb"}), ("li", {}), ("span", {}), ("a", {})])
    )
    assert not sel_matches(desc, _paths([("ul", {}), ("li", {}), ("a", {})]))
    nested = compile_selector("div.module-pagination div.nums > a")
    assert sel_matches(
        nested,
        _paths([("div", {"class": "module-pagination"}), ("div", {"class": "nums"}), ("a", {})]),
    )


def test_selector_nth_child():
    c = compile_selector("div.product_art span:nth-child(2)")
    html = '<div class="product_art"><span>k:</span><span>V-2</span><span>x</span></div>'
    r = parse_with_rules(SITE_RULES["101tea"], "http://101tea.ru/p/", f"<html><body><h1>n</h1><span class='js-price-val'>1</span>{html}</body></html>")
    assert r["sku"] == "V-2"
    assert c is not None


def test_unsupported_selector_raises():
    with pytest.raises(ValueError):
        compile_selector("a:hover")
    with pytest.raises(ValueError):
        compile_selector("")


# ------------------------------------------------- nested-markup regression

def test_nested_markup_full_descendant_text():
    # round-4 advice: '<span class="price">1<b>2</b>3</span>' must yield 123
    html = ('<html><body class="kind-product">'
            '<span class="price">1<b>2</b>3</span></body></html>')
    parsed = parse_site_html("http://h.test/p", html)
    assert parsed["price_str"] == "123"


def test_implicitly_closed_li_does_not_desync():
    # bare <li> items (never closed) around a capture target
    html = ('<html><body><ul class="breadcrumb"><li><a>A</a><li><a>B</a></ul>'
            '<h1 class="product__title">N</h1>'
            '<span class="product__price-cur">5</span></body></html>')
    r = parse_with_rules(SITE_RULES["rusteaco"], "http://shop.rusteaco.ru/x/", html)
    assert r["category"] == "A / B"
    assert r["name"] == "N"


def test_first_match_wins_single_fields():
    html = ('<html><body><h1 class="switcher-title">First</h1>'
            '<h1 class="switcher-title">Second</h1>'
            '<span class="price__new-val">9</span></body></html>')
    r = parse_with_rules(SITE_RULES["teanadin"], "http://teanadin.ru/x/", html)
    assert r["name"] == "First"


# ------------------------------------------------------- per-site parity

@pytest.mark.parametrize("site", SITES)
def test_product_field_parity(site):
    fx = build_fixture(site)
    parse = make_site_parse_fn(fx.rules)
    for url in fx.product_urls:
        got = parse(url, fx.pages[url])
        assert got is not None and got["kind"] == "product", (site, url)
        exp = fx.expect[url]
        for k in ("name", "sku", "price_str", "amount_str", "units_raw",
                  "description", "category", "variants_json"):
            assert got[k] == exp[k], (site, url, k, got[k], exp[k])
        assert [im["src"] for im in got["images"]] == exp["images"], (site, url)


@pytest.mark.parametrize("site", SITES)
def test_listing_and_menu_parity(site):
    fx = build_fixture(site)
    parse = make_site_parse_fn(fx.rules)
    menu = parse(fx.menu_url, fx.pages[fx.menu_url])
    assert menu["kind"] == "seed"
    assert menu["out_links"] == [fx.category_url]

    cat = parse(fx.category_url, fx.pages[fx.category_url])
    assert cat["kind"] == "category"
    assert cat["out_links"] == fx.product_urls
    if fx.rules.last_page_rule == "second_last":
        # trailing next-arrow; the engine's per-site read rule takes -2
        assert cat["page_labels"] == ["1", "2", "→"]
        assert cat["page_labels"][-2] == "2"
    else:
        assert cat["page_labels"] == ["1", "2"]
        assert cat["page_labels"][-1] == "2"

    page2 = parse(fx.page2_url, fx.pages[fx.page2_url])
    assert page2["kind"] == "listing"  # page_param present in query


def test_multi_site_dispatch():
    parse = make_multi_site_parse_fn()
    for site in SITES:
        fx = build_fixture(site)
        url = fx.product_urls[0]
        got = parse(url, fx.pages[url])
        assert got is not None and got["name"] == fx.expect[url]["name"], site
    assert parse("http://unknown.example/x", "<html></html>") is None


def test_unrecognizable_page_is_none():
    for site in SITES:
        assert make_site_parse_fn(SITE_RULES[site])(
            f"http://{SITE_RULES[site].host}/weird", "<html><body><p>hi</p></body></html>"
        ) is None


# --------------------------------------------------------------- SSRF guards

def test_transport_rejects_non_http_schemes(monkeypatch):
    calls = []
    monkeypatch.setattr(
        "urllib.request.urlopen",
        lambda *a, **k: calls.append(a) or (_ for _ in ()).throw(AssertionError),
    )
    t = real_http_transport(backoff_s=0.0)
    assert t("file:///etc/passwd") is None
    assert t("ftp://h/f") is None
    assert calls == []  # urlopen never reached


def test_fetch_stage_skips_off_host_images():
    fx = build_fixture("wintergreen")
    url = fx.product_urls[0]
    evil = fx.pages[url].replace(
        'data-src="/upload/wg1.jpg"', 'data-src="file:///etc/passwd"'
    )
    seen_urls = []

    def transport(u):
        seen_urls.append(u)
        return evil.encode() if u == url else None

    fetch = make_http_fetch_fn(lambda: transport, make_site_parse_fn(fx.rules))
    pdf = pd.DataFrame([{
        "url_hash": 1, "url": url, "host": fx.rules.host, "depth": 2, "ord": "0000",
    }])
    out = pd.concat(list(fetch(iter([pdf]))))
    assert bool(out.iloc[0]["ok"])
    assert out.iloc[0]["images"] is None  # off-host src never fetched
    assert all(u == url for u in seen_urls)


# ------------------------------------------------- production stage, 5 sites

def test_all_sites_through_fetch_stage(spark):
    rows, expected = [], {}
    transports = {}
    for site in SITES:
        fx = build_fixture(site)
        transports.update({u: fx for u in fx.pages})
        transports.update({u: fx for u in fx.images})
        urls = [fx.menu_url, fx.category_url, fx.page2_url, *fx.product_urls]
        for j, u in enumerate(urls):
            rows.append({
                "url_hash": hash((site, j)), "url": u, "host": fx.rules.host,
                "depth": j, "ord": f"{j:04x}",
            })
        expected.update({u: (site, fx) for u in urls})

    def transport(u):
        fx = transports.get(u)
        if fx is None:
            return None
        if u in fx.images:
            return fx.images[u]
        return fx.pages[u].encode()

    fetch = make_http_fetch_fn(lambda: transport, make_multi_site_parse_fn())
    frontier = spark.createDataFrame(
        pd.DataFrame(rows),
        "url_hash long, url string, host string, depth int, ord string",
    )
    out = {
        r["url"]: r
        for r in frontier.mapInPandas(fetch, schemas.FETCHED).collect()
    }
    assert len(out) == len(rows)
    for u, (site, fx) in expected.items():
        r = out[u]
        assert r["ok"], (site, u)
        if u in fx.expect:  # product page
            exp = fx.expect[u]
            assert r["kind"] == "product"
            assert r["name"] == exp["name"] and r["sku"] == exp["sku"]
            assert r["price_str"] == exp["price_str"]
            assert r["amount_str"] == exp["amount_str"]
            assert r["variants_json"] == exp["variants_json"]
            imgs = r["images"] or []
            assert [im["image_id"] for im in imgs] == [
                src.rsplit("/", 1)[-1] for src in exp["images"]
            ]
            for im, src in zip(imgs, exp["images"]):
                assert bytes(im["bytes"]) == fx.images[src]
        elif u == fx.menu_url:
            assert r["kind"] == "seed" and r["out_links"] == [fx.category_url]
        elif u == fx.category_url:
            assert r["kind"] == "category"
            assert list(r["out_links"]) == fx.product_urls
        else:
            assert r["kind"] == "listing"
