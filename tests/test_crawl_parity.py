"""The core parity gate (SURVEY.md §5.2): Spark engine vs pure-Python oracle.

Asserts, for the same seed list + politeness budgets over the same
deterministic synthetic world:
* scheduled-fetch (crawl) ordering — exact sequence equality,
* final URL-seen membership — exact set equality,
* every validated/deduped/variant-exploded result row,
* per-image decoded pixels (exact for PNG) + caption byte-equality,
* per-round lineage metrics.
"""

from __future__ import annotations

import numpy as np
import pytest

from pushkind_crawlers_spark.operators.multimodal import decode_image, sniff_format
from pushkind_crawlers_spark.oracle import OracleCrawler
from pushkind_crawlers_spark.plans.crawl import CrawlEngine
from pushkind_crawlers_spark.synth.png import psnr
from pushkind_crawlers_spark.synth.phash import phash64
from pushkind_crawlers_spark.synth.worldgen import image_fmt, make_image_pixels


@pytest.fixture(scope="module")
def crawl_pair(spark, small_world, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("crawl_store"))
    oracle = OracleCrawler(small_world).run()
    engine = CrawlEngine(spark, small_world, root, use_bloom=True, use_robots=True)
    run = engine.run()
    return oracle, engine, run


def test_crawl_order_parity(spark, crawl_pair):
    oracle, engine, _ = crawl_pair
    got = [
        (r["seq"], r["round"], r["url"], r["depth"], r["ord"])
        for r in engine.store.table("crawl_order").read(spark).orderBy("seq").collect()
    ]
    want = [(r["seq"], r["round"], r["url"], r["depth"], r["ord"]) for r in oracle.order]
    assert got == want


def test_seen_set_parity(spark, crawl_pair):
    oracle, engine, _ = crawl_pair
    got = {
        r["url"]: r["discovered_round"]
        for r in engine.store.table("seen").read(spark).collect()
    }
    assert got == oracle.seen


def test_results_parity(spark, crawl_pair):
    oracle, engine, _ = crawl_pair
    cols = [
        "crawler_id", "url", "host", "sku", "name", "price", "category",
        "units", "amount", "description", "caption", "ord", "round",
    ]
    rows = engine.store.table("results").read(spark).collect()
    got = sorted(
        [tuple(r[c] for c in cols) + (tuple(r["image_ids"] or []),) for r in rows]
    )
    want = sorted(
        [tuple(r[c] for c in cols) + (tuple(r["image_ids"]),) for r in oracle.results]
    )
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g == w, f"\ngot:  {g}\nwant: {w}"


def test_rejects_parity(spark, crawl_pair):
    oracle, engine, _ = crawl_pair
    rows = engine.store.table("rejects").read(spark).collect()
    got = sorted((r["url"], r["reject_reason"], r["round"]) for r in rows)
    want = sorted((r["url"], r["reject_reason"], r["round"]) for r in oracle.rejects)
    assert got == want


def test_image_payload_parity(spark, crawl_pair, small_world):
    """input_hint invariant, per format: PNG decodes pixel-exact; lossy
    ('jpg' / LJQ1) decodes within PSNR>=40dB of the generator's source
    pixels AND bit-identically to the deterministic codec twin. Caption
    byte-equality and phash-of-decoded-pixels hold for both."""
    oracle, engine, _ = crawl_pair
    rows = engine.store.table("images").read(spark).collect()
    by_id = {r["image_id"]: r for r in rows}
    want = {im["image_id"]: im for im in oracle.images}
    assert set(by_id) == set(want)
    seed = small_world.cfg.seed
    sizes = small_world.cfg.image_sizes
    fmts_seen = set()
    for image_id, o in list(want.items())[:60]:
        g = by_id[image_id]
        assert g["caption"].encode() == o["caption"].encode()
        source_px = make_image_pixels(seed, image_id, sizes)
        fmt = sniff_format(bytes(g["bytes"]))
        assert fmt == image_fmt(seed, image_id)
        assert g["fmt"] == fmt
        fmts_seen.add(fmt)
        decoded_px = decode_image(bytes(g["bytes"]), fmt)
        if fmt == "png":
            assert np.array_equal(decoded_px, source_px)
        else:
            assert psnr(decoded_px, source_px) >= 40.0, image_id
        assert g["w"] == source_px.shape[1] and g["h"] == source_px.shape[0]
        assert g["phash"] == phash64(decoded_px)
    assert fmts_seen == {"png", "jpg"}, f"format mix not exercised: {fmts_seen}"


def test_lineage_parity(spark, crawl_pair):
    oracle, engine, _ = crawl_pair
    keys = [
        "scheduled", "fetched", "fetch_errors", "links_discovered",
        "links_new", "links_dup", "robots_rejected", "results_rows", "reject_rows",
    ]
    rows = engine.store.table("lineage").read(spark).collect()
    got = {(r["round"], r["host"]): tuple(r[k] for k in keys) for r in rows}
    want = {(ln["round"], ln["host"]): tuple(ln[k] for k in keys) for ln in oracle.lineage}
    assert got == want


def test_budget_never_exceeded(spark, crawl_pair, small_world):
    _, engine, _ = crawl_pair
    budgets = {r["host"]: r["budget_per_round"] for r in small_world.politeness_rows()}
    rows = (
        engine.store.table("crawl_order").read(spark)
        .groupBy("round", "host").count().collect()
    )
    for r in rows:
        assert r["count"] <= budgets[r["host"]], (r["round"], r["host"], r["count"])


def test_no_url_fetched_twice(spark, crawl_pair):
    _, engine, _ = crawl_pair
    order = engine.store.table("crawl_order").read(spark)
    assert order.count() == order.select("url").distinct().count()


def test_sidecar_mode_crawl_identical(spark, small_world, crawl_pair, tmp_path_factory):
    """seen_mode='sidecar' (incrementally-maintained per-shard cuckoo
    filters, snapshot-committed per round) reproduces the oracle crawl
    bit-for-bit: same order, same seen set — the filter swap is invisible
    to semantics, as the north rule requires."""
    oracle, _, _ = crawl_pair
    root = str(tmp_path_factory.mktemp("crawl_store_sidecar"))
    engine = CrawlEngine(spark, small_world, root, use_bloom=True,
                         use_robots=True, seen_mode="sidecar",
                         sidecar_shards=8)
    engine.run()
    got = [
        (r["seq"], r["round"], r["url"], r["depth"], r["ord"])
        for r in engine.store.table("crawl_order").read(spark).orderBy("seq").collect()
    ]
    want = [(r["seq"], r["round"], r["url"], r["depth"], r["ord"]) for r in oracle.order]
    assert got == want
    seen = {r["url"]: r["discovered_round"]
            for r in engine.store.table("seen").read(spark).collect()}
    assert seen == oracle.seen
    # the sidecar table is committed and loadable: one row per non-empty
    # shard, none degraded at this scale
    side = engine.store.table("seen_sidecar").read(spark).collect()
    assert 0 < len(side) <= 8
    assert not any(r["degraded"] for r in side)
    assert sum(r["count"] for r in side) >= len(oracle.seen)
