"""Novelty-priority parity: engine vs pure-Python twin (north rule's
phash-dedup novelty term, parent-scoped).

Asserts over a full novelty-weighted crawl, per committed round:
(a) depth dominance — per (round, host) every scheduled row's depth <=
    every left-behind frontier row's depth (cross-depth order unchanged);
(b) stored priorities of rows discovered in round r equal a pure-Python
    recomputation (decode -> phash -> min-Hamming vs the deterministic
    seen-sample -> mean per parent -> linear combine);
(c) per (round, host) the scheduled set is exactly the top-budget prefix
    of the frontier under (priority desc, depth, ord);
(d) completeness — the final URL-seen membership equals the parity
    (novelty=0) oracle's: novelty reorders, never drops or adds.
"""

from __future__ import annotations

import numpy as np
import pytest

from pushkind_crawlers_spark.operators.multimodal import decode_image, sniff_format
from pushkind_crawlers_spark.operators.priority import PriorityWeights, novelty_py
from pushkind_crawlers_spark.oracle import OracleCrawler
from pushkind_crawlers_spark.plans.crawl import CrawlEngine
from pushkind_crawlers_spark.synth.phash import gray32, phash64_batch
from pushkind_crawlers_spark.synth.worldgen import SyntheticWorld, WorldConfig

W_NOV = 0.45


@pytest.fixture(scope="module")
def nov_world() -> SyntheticWorld:
    return SyntheticWorld(
        WorldConfig(
            seed=19, n_hosts=2, hot_factor=2,
            categories_range=(3, 4), pages_range=(1, 2),
            links_per_page=(4, 6), images_per_product=(0, 1),
            image_sizes=(32,), budget_scale=2,
        )
    )


@pytest.fixture(scope="module")
def nov_run(spark, nov_world, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("nov_store"))
    eng = CrawlEngine(
        spark, nov_world, root,
        weights=PriorityWeights(depth=1.0, novelty=W_NOV, budget=0.0),
    )
    run = eng.run()
    return eng, run


def _snap_by_round(table) -> dict[int, int]:
    return {s["properties"].get("round"): s["snapshot_id"] for s in table.snapshots()}


def _page_phashes(world, url: str) -> list[int]:
    doc = world.fetch(url)
    if doc is None or not doc.images:
        return []
    out = []
    for im in doc.images:
        raw = im["bytes"]
        px = decode_image(raw, sniff_format(raw))
        out.append(int(phash64_batch(gray32(px)[None])[0]))
    return out


def test_novelty_run_parity(spark, nov_world, nov_run):
    eng, run = nov_run
    frontier_t = eng.store.table("frontier")
    images_t = eng.store.table("images")
    f_snaps = _snap_by_round(frontier_t)
    i_snaps = _snap_by_round(images_t)
    order = eng.store.table("crawl_order").read(spark).collect()
    sched_by_round: dict[int, list] = {}
    for r in order:
        sched_by_round.setdefault(r["round"], []).append(r)
    budgets = {p["host"]: p["budget_per_round"] for p in nov_world.politeness_rows()}

    checked_b = 0
    reordered = False
    for rnd in sorted(sched_by_round):
        prev = rnd - 1
        frontier_prev = frontier_t.read(spark, f_snaps[prev]).collect()
        sched = sched_by_round[rnd]
        sched_urls = {r["url"] for r in sched}

        # (a) depth dominance + (c) top-b prefix per host
        by_host: dict[str, list] = {}
        for row in frontier_prev:
            by_host.setdefault(row["host"], []).append(row)
        for host, rows in by_host.items():
            rows.sort(key=lambda r: (-r["priority"], r["depth"], r["ord"]))
            b = budgets[host]
            want = {r["url"] for r in rows[:b]}
            got = {r["url"] for r in sched if r["host"] == host}
            assert got == want, (rnd, host)                       # (c)
            if len(rows) > b:
                max_sched = max(r["depth"] for r in rows[:b])
                min_left = min(r["depth"] for r in rows[b:])
                assert max_sched <= min_left, (rnd, host)          # (a)

        # (b) twin recomputation of priorities discovered this round
        sample_rows = sorted(
            images_t.read(spark, i_snaps[prev]).select("image_id", "phash").collect(),
            key=lambda r: r["image_id"],
        )[:4096]
        sample = [r["phash"] for r in sample_rows]
        parent_nov = {}
        for r in sched:
            phs = _page_phashes(nov_world, r["url"])
            if phs:
                parent_nov[r["url_hash"]] = float(
                    np.mean([novelty_py(p, sample) for p in phs])
                )
        frontier_now = frontier_t.read(spark, f_snaps[rnd]).collect()
        for row in frontier_now:
            if row["discovered_round"] != rnd:
                continue
            nov = parent_nov.get(row["parent_hash"], 0.0)
            want_p = -1.0 * row["depth"] + W_NOV * min(max(nov, 0.0), 1.0)
            assert row["priority"] == pytest.approx(want_p, abs=1e-9), row["url"]
            checked_b += 1
            if nov > 0.0:
                reordered = True
    assert checked_b > 0
    assert reordered, "no banner novelty ever fed a priority — test is vacuous"

    # (d) completeness: same final seen membership as the parity oracle
    oracle = OracleCrawler(nov_world).run()
    got_seen = {r["url"] for r in eng.store.table("seen").read(spark).collect()}
    assert got_seen == set(oracle.seen)
