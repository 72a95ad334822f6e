"""Production HTTP fetch path (VERDICT r03 missing #3).

Three layers, outermost-in:

* transport: retry/backoff/non-2xx contract of ``real_http_transport``
  (urllib monkeypatched — no network), matching the reference's
  ``fetch_html`` skip-on-error (/root/reference/src/crawlers/wintergreen.rs:49-52);
* parse: ``render_page -> parse_site_html`` round-trips every page of the
  synthetic world back to the exact fields the in-process world fetch
  emits (selector rules modeled on wintergreen.rs:66,90);
* engine: a full crawl through ``make_http_fetch_fn`` over the HTML
  transport double produces byte-identical results/seen/crawl_order to
  the default in-process world fetch — the engine is oblivious to which
  fetcher runs.
"""

from __future__ import annotations

import io
import urllib.error

import pytest

from pushkind_crawlers_spark.plans.http_fetch import (
    http_robots_txt_fn,
    make_http_fetch_fn,
    parse_site_html,
    real_http_transport,
)
from pushkind_crawlers_spark.synth.htmlgen import (
    render_page,
    world_http_transport,
)


# --------------------------------------------------------------- transport

class _FakeResponses:
    """Scripted urlopen: pops one outcome per call.

    Outcome = bytes (200 body) | int (HTTP status error) | Exception.
    """

    def __init__(self, script):
        self.script = list(script)
        self.calls = 0

    def __call__(self, req, timeout=None):
        self.calls += 1
        out = self.script.pop(0)
        if isinstance(out, int):
            raise urllib.error.HTTPError(req.full_url, out, "err", {}, io.BytesIO())
        if isinstance(out, Exception):
            raise out

        class _Resp:
            def __enter__(self_):
                return self_

            def __exit__(self_, *a):
                return False

            def read(self_):
                return out

        return _Resp()


def _patched_transport(monkeypatch, script, **kw):
    fake = _FakeResponses(script)
    monkeypatch.setattr("urllib.request.urlopen", fake)
    kw.setdefault("backoff_s", 0.0)
    return real_http_transport(**kw), fake


def test_transport_200(monkeypatch):
    t, fake = _patched_transport(monkeypatch, [b"hello"])
    assert t("http://h/x") == b"hello"
    assert fake.calls == 1


def test_transport_404_no_retry(monkeypatch):
    t, fake = _patched_transport(monkeypatch, [404, b"never"])
    assert t("http://h/x") is None
    assert fake.calls == 1  # 4xx never retries (it won't get better)


def test_transport_5xx_retries_then_succeeds(monkeypatch):
    t, fake = _patched_transport(monkeypatch, [500, 503, b"ok"], retries=2)
    assert t("http://h/x") == b"ok"
    assert fake.calls == 3


def test_transport_connection_error_exhausts_retries(monkeypatch):
    t, fake = _patched_transport(
        monkeypatch,
        [urllib.error.URLError("boom"), TimeoutError(), OSError()],
        retries=2,
    )
    assert t("http://h/x") is None
    assert fake.calls == 3


def test_transport_url_rewrite(monkeypatch):
    seen = {}

    def fake(req, timeout=None):
        seen["url"] = req.full_url
        raise urllib.error.HTTPError(req.full_url, 404, "e", {}, io.BytesIO())

    monkeypatch.setattr("urllib.request.urlopen", fake)
    t = real_http_transport(
        url_rewrite=lambda u: u.replace("http://logical", "http://127.0.0.1:9")
    )
    t("http://logical/p")
    assert seen["url"] == "http://127.0.0.1:9/p"


# ------------------------------------------------------------------- parse

def _walk_world(world, limit=None):
    """BFS every fetchable page of the world."""
    from collections import deque

    q = deque(world.seed_urls())
    seen, docs = set(q), []
    while q:
        url = q.popleft()
        doc = world.fetch(url)
        if doc is None:
            continue
        docs.append(doc)
        for nxt in doc.out_links:
            if nxt not in seen:
                seen.add(nxt)
                q.append(nxt)
        if limit and len(docs) >= limit:
            break
    return docs


def test_render_parse_roundtrip_every_page(small_world):
    """parse(render(doc)) reproduces the in-process fetch's fields for
    EVERY page in the world — including whitespace names, NBSP prices,
    entity-escaped variants JSON (S6) and image captions."""
    docs = _walk_world(small_world)
    assert len(docs) >= 40
    kinds = set()
    for doc in docs:
        parsed = parse_site_html(doc.url, render_page(doc))
        assert parsed is not None, doc.url
        kinds.add(parsed["kind"])
        assert parsed["kind"] == doc.kind
        assert parsed["out_links"] == list(doc.out_links), doc.url
        assert parsed["page_labels"] == list(doc.page_labels)
        assert parsed["variants_json"] == doc.variants_json
        assert [im["image_id"] for im in parsed["images"]] == [
            im["image_id"] for im in doc.images
        ]
        assert [im["caption"] for im in parsed["images"]] == [
            im["caption"] for im in doc.images
        ]
        if doc.payload:
            p = doc.payload
            assert parsed["name"] == p["name"]          # incl. whitespace-only
            assert parsed["sku"] == p["sku"]            # incl. empty
            assert parsed["category"] == p["category"]
            assert parsed["price_str"] == p["price_str"]  # NBSP + ₽ intact
            assert parsed["amount_str"] == p["amount_str"]
            assert parsed["units_raw"] == p["units"]
            assert parsed["description"] == p["description"]
    assert {"seed", "category", "product"} <= kinds


def test_parse_unrecognized_template_is_none():
    assert parse_site_html("http://h/x", "<html><body>404</body></html>") is None


def test_world_transport_serves_images_and_robots(small_world):
    t = world_http_transport(small_world)
    host = small_world.cfg.hosts()[0]
    robots = http_robots_txt_fn(lambda: t)(host)
    assert robots == small_world.robots_txt(host)
    assert t(f"http://{host}/robots.txt") is not None or robots is None
    assert t("http://unknown-host.test/") is None
    # image bytes served by id match the world's ground-truth payloads
    for doc in _walk_world(small_world, limit=40):
        for im in doc.images:
            assert t(f"http://{doc.host}/img/{im['image_id']}") == im["bytes"]


# ------------------------------------------------------------------ engine

def test_http_fetch_stage_matches_world_fetch(spark, small_world):
    """The mapInPandas stage itself: same frontier batch through the
    HTTP fetcher (transport double) and the in-process world fetcher
    yields identical FETCHED rows (minus last_page, which only the
    world's ground truth carries — the engine derives it from
    page_labels + the per-site rule, crawl.py pagination join)."""
    import pandas as pd

    from pushkind_crawlers_spark import schemas
    from pushkind_crawlers_spark.plans.crawl import make_world_fetch_fn

    docs = _walk_world(small_world, limit=60)
    rows = [
        (hash(d.url) % (1 << 60), d.url, d.host, d.depth, f"{i:04x}")
        for i, d in enumerate(docs)
    ]
    # one dead URL: both fetchers must emit the same ok=False row
    rows.append((1, f"http://{docs[0].host}/nope", docs[0].host, 1, "ffff"))
    frontier = spark.createDataFrame(
        rows, "url_hash long, url string, host string, depth int, ord string"
    )
    world_fn = make_world_fetch_fn(small_world)
    http_fn = make_http_fetch_fn(
        transport_factory=lambda: world_http_transport(small_world)
    )
    a = frontier.mapInPandas(world_fn, schemas.FETCHED)
    b = frontier.mapInPandas(http_fn, schemas.FETCHED)

    def snap(df):
        out = {}
        for r in df.collect():
            d = r.asDict(recursive=True)
            d.pop("last_page")
            imgs = d.pop("images")
            d["images"] = (
                [(i["image_id"], bytes(i["bytes"]), i["caption"]) for i in imgs]
                if imgs is not None else None
            )
            out[d["url"]] = d
        return out

    sa, sb = snap(a), snap(b)
    assert set(sa) == set(sb)
    for url in sa:
        assert sa[url] == sb[url], url
    assert not sa[f"http://{docs[0].host}/nope"]["ok"]


def test_crawl_through_http_transport_matches_world_fetch(
    spark, small_world, tmp_path_factory
):
    """Full-engine parity: the same 3-round crawl through the HTTP
    fetch/parse path and the in-process world fetch commits identical
    results, seen sets, and crawl order."""
    from pushkind_crawlers_spark.plans.crawl import CrawlEngine

    def run(root, **kw):
        eng = CrawlEngine(spark, small_world, str(root), keep_images=True, **kw)
        eng.run(max_rounds=3)
        state, dfs = eng._read_state()
        return {
            "results": sorted(
                (r["url"], r["sku"], r["price"]) for r in dfs["results"].collect()
            ),
            "seen": sorted(r["url"] for r in dfs["seen"].collect()),
            "order": [
                (r["seq"], r["url"])
                for r in dfs["crawl_order"].orderBy("seq").collect()
            ],
            "images": sorted(
                (r["image_id"], r["caption"]) for r in dfs["images"].collect()
            ),
        }

    base = run(tmp_path_factory.mktemp("world-fetch"))
    http = run(
        tmp_path_factory.mktemp("http-fetch"),
        fetch_fn=make_http_fetch_fn(
            transport_factory=lambda: world_http_transport(small_world)
        ),
        robots_fn=http_robots_txt_fn(
            lambda: world_http_transport(small_world)
        ),
    )
    assert http == base
