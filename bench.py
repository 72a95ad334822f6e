#!/usr/bin/env python
"""Benchmark harness (driver contract + BASELINE.json metric).

Default mode: runs the headline query suite at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], plus a
synthetic-world crawl throughput measurement (URLs scheduled+fetched/sec
and frontier-dedup links/sec — the BASELINE.json metric), and prints ONE
JSON line::

    {"metric": "...", "value": <total suite sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "crawl": {...}}

Scaling mode (``python bench.py --scaling``): runs the SAME crawl world
at local[8] and local[32] in fresh subprocesses (clean JVMs — the
sandbox stand-in for N and 4N executors per BASELINE.json), reports
throughput at both plus scaling efficiency, and rewrites BENCH.md.

Internal worker mode (``--crawl-worker``) is how the subprocesses run.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# Shrink knob for fast local iteration (1.0 = full bench world).
BENCH_SCALE = float(os.environ.get("SPARK_GRAFT_BENCH_SCALE", "1.0"))

HEADLINE_QUERIES = [
    "q1_pricing_summary",
    "q3_top_revenue",
    "q5_nation_revenue",
    "events_sessionize",
    "first_wins_dedup",
    "topk_per_group",
    "upsert_merge",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ngram_jaccard",
    "embedding_neardup",
    "ann_topk_cosine",
    "text_quality",
    "doc_fingerprint",
]


def bench_world_cfg():
    from pushkind_crawlers_spark.synth.worldgen import WorldConfig

    s = BENCH_SCALE
    return WorldConfig(
        seed=42,
        n_hosts=8,
        hot_host_idx=0,
        hot_factor=4,
        categories_range=(max(2, int(16 * s)), max(3, int(24 * s))),
        pages_range=(2, 4),
        links_per_page=(max(4, int(24 * s)), max(6, int(48 * s))),
        images_per_product=(0, 1),
        image_sizes=(32,),
        budget_scale=max(10, int(1500 * s)),
    )


def run_crawl(cpus: int, store_root: str) -> dict:
    """One full crawl of the bench world; returns throughput numbers."""
    from pushkind_crawlers_spark.plans.crawl import CrawlEngine
    from pushkind_crawlers_spark.session import get_spark
    from pushkind_crawlers_spark.synth.worldgen import SyntheticWorld

    spark = get_spark(app=f"bench-crawl-{cpus}", master=f"local[{cpus}]",
                      shuffle_partitions=max(8, cpus))
    world = SyntheticWorld(bench_world_cfg())
    eng = CrawlEngine(spark, world, store_root)
    t0 = time.time()
    run = eng.run()
    wall = time.time() - t0
    fetched = sum(m.fetched for m in run.metrics)
    discovered = sum(m.links_discovered for m in run.metrics)
    new = sum(m.links_new for m in run.metrics)
    results = sum(m.results_rows for m in run.metrics)
    spark.stop()
    return {
        "cpus": cpus,
        "rounds": run.rounds,
        "urls_scheduled": run.total_scheduled,
        "urls_fetched": fetched,
        "links_discovered": discovered,
        "links_new": new,
        "results_rows": results,
        "wall_s": round(wall, 2),
        "urls_per_sec": round(run.total_scheduled / wall, 1),
        "dedup_links_per_sec": round(discovered / wall, 1),
    }


def run_queries(spark, sf_dir: str) -> dict[str, float]:
    from pushkind_crawlers_spark.queries import QUERIES

    out = {}
    for name in HEADLINE_QUERIES:
        t0 = time.time()
        QUERIES[name](spark, sf_dir).count()
        out[name] = round(time.time() - t0, 3)
    return out


def main() -> None:
    from pushkind_crawlers_spark.session import get_spark

    spark = get_spark(app="bench", master=f"local[{CPUS}]",
                      shuffle_partitions=max(8, CPUS))
    # warm the JVM/parquet reader so per-query times reflect steady state
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()
    qt = run_queries(spark, SF_DIR)
    spark.stop()

    with tempfile.TemporaryDirectory() as store:
        crawl = run_crawl(CPUS, store)

    total = round(sum(qt.values()) + crawl["wall_s"], 2)
    print(json.dumps({
        "metric": "headline suite wall (queries sf0.1 + synthetic crawl); "
                  "crawl.urls_per_sec is the BASELINE.json frontier metric",
        "value": total,
        "unit": "sec",
        "queries": qt,
        "sf": float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1]),
        "crawl": crawl,
    }))


def scaling() -> None:
    """N vs 4N evidence: same world, fresh subprocess per parallelism."""
    rows = {}
    for cpus in (8, 32):
        with tempfile.TemporaryDirectory() as store:
            proc = subprocess.run(
                [sys.executable, __file__, "--crawl-worker", str(cpus), store],
                capture_output=True, text=True, check=True,
                env={**os.environ, "SPARK_GRAFT_CPUS": str(cpus)},
            )
            rows[cpus] = json.loads(proc.stdout.strip().splitlines()[-1])
    t8, t32 = rows[8]["urls_per_sec"], rows[32]["urls_per_sec"]
    eff = round(t32 / (4.0 * t8), 3)
    report = {
        "local8": rows[8], "local32": rows[32],
        "scaling_efficiency": eff, "target": 0.8, "pass": eff >= 0.8,
    }
    print(json.dumps(report))
    with open(os.path.join(os.path.dirname(__file__), "BENCH.md"), "w") as f:
        f.write(
            "# BENCH — crawl throughput scaling (N vs 4N)\n\n"
            "Same synthetic world + seed list + politeness budgets run at two\n"
            "parallelism levels in fresh JVMs (`local[8]` vs `local[32]`,\n"
            "the sandbox stand-in for N vs 4N executors per BASELINE.json —\n"
            "no real cluster available here).\n\n"
            "| parallelism | URLs scheduled | wall (s) | URLs/sec | dedup links/sec |\n"
            "|---|---|---|---|---|\n"
            f"| local[8] | {rows[8]['urls_scheduled']} | {rows[8]['wall_s']}"
            f" | {rows[8]['urls_per_sec']} | {rows[8]['dedup_links_per_sec']} |\n"
            f"| local[32] | {rows[32]['urls_scheduled']} | {rows[32]['wall_s']}"
            f" | {rows[32]['urls_per_sec']} | {rows[32]['dedup_links_per_sec']} |\n\n"
            f"**Scaling efficiency** = urls_per_sec(32) / (4 × urls_per_sec(8))"
            f" = **{eff}** (target ≥ 0.8: {'PASS' if eff >= 0.8 else 'FAIL'}).\n\n"
            f"Bench world: {rows[32]['rounds']} rounds,"
            f" {rows[32]['urls_fetched']} URLs fetched,"
            f" {rows[32]['links_discovered']} links discovered,"
            f" {rows[32]['results_rows']} result rows.\n"
        )


if __name__ == "__main__":
    if len(sys.argv) >= 2 and sys.argv[1] == "--crawl-worker":
        print(json.dumps(run_crawl(int(sys.argv[2]), sys.argv[3])))
    elif len(sys.argv) >= 2 and sys.argv[1] == "--scaling":
        scaling()
    else:
        main()
