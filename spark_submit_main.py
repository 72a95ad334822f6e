#!/usr/bin/env python
"""spark-submit entry point for a crawl run (north rule: runs are submitted
via ``spark-submit --py-files`` to the cluster).

Local smoke (the sandbox has no cluster — master comes from the submit):

    cd /root/repo && zip -qr /tmp/pcs.zip pushkind_crawlers_spark
    spark-submit --master 'local[8]' --py-files /tmp/pcs.zip \
        spark_submit_main.py --store /tmp/crawl_store --seed 7 \
        --hosts 2 --budget-scale 4

On a real cluster the same invocation takes ``--master yarn`` /
``--master k8s://...``; the engine itself is master-agnostic. Resume a
checkpointed run by re-submitting with the same ``--store`` and
``--resume`` (the run picks up from the last committed round's snapshot).
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import SparkSession


def main(argv: list[str], _stop_session: bool = True) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--store", required=True, help="snapshot store root")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--hosts", type=int, default=3)
    p.add_argument("--budget-scale", type=int, default=1)
    p.add_argument("--max-rounds", type=int, default=None)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--run-id", default=None)
    p.add_argument("--seen-mode", default="auto",
                   choices=["auto", "anti", "cuckoo", "sidecar"],
                   help="URL-seen confirm strategy; auto = anti on "
                        "local[N] masters, sidecar on cluster masters "
                        "(the mode whose scaling evidence exists)")
    p.add_argument("--sidecar-shards", type=int, default=32)
    p.add_argument("--urls", default=None,
                   help="comma-separated URL list: targeted re-fetch of "
                        "exactly these pages instead of seed expansion "
                        "(the reference's partial run, "
                        "src/processing/crawler.rs:67-79)")
    # the reference service dispatches three ZMQ message types
    # (src/main.rs:57-102: Crawler / Benchmark / ProductCategoryMatch);
    # --job is that dispatch surface as a CLI
    p.add_argument("--job", default="crawl",
                   choices=["crawl", "benchmark", "category", "curate"])
    p.add_argument("--benchmark-id", type=int, default=1)
    p.add_argument("--benchmark-prompt", default=None,
                   help="prompt text for --job benchmark")
    p.add_argument("--categories", default=None,
                   help="'id:name,id:name' list for --job category")
    p.add_argument("--expire-keep-last", type=int, default=None,
                   help="retain only the last N rounds' snapshots and "
                        "staging dirs (long-crawl retention; default: "
                        "keep everything)")
    p.add_argument("--compact-every", type=int, default=None,
                   help="every N rounds rewrite the append-chain tables' "
                        "accumulated per-round data dirs into one "
                        "(rewrite_data_files analog; default: never)")
    p.add_argument("--input", default=None,
                   help="parquet path of (doc_id, text) documents for "
                        "--job curate")
    p.add_argument("--min-tokens", type=int, default=8)
    p.add_argument("--min-quality", type=float, default=0.3)
    p.add_argument("--jaccard-threshold", type=float, default=0.2)
    p.add_argument("--hub-id", type=int, default=None,
                   help="scope benchmark/category jobs to one hub's "
                        "crawlers (crawlers table; src/repository/"
                        "crawler.rs:21-37)")
    p.add_argument("--real-sites", action="store_true",
                   help="crawl the five reference webstores over live "
                        "HTTP (site dim + selectors from "
                        "plans/site_rules.py SITE_RULES) instead of the "
                        "synthetic world")
    args = p.parse_args(argv)

    # session comes from spark-submit (master/deploy-mode/conf on the CLI)
    spark = SparkSession.builder.appName("pushkind-crawlers-spark").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from pushkind_crawlers_spark.plans.crawl import CrawlEngine
    from pushkind_crawlers_spark.store.ops import RunLock
    from pushkind_crawlers_spark.store.snapshots import SnapshotStore
    from pushkind_crawlers_spark.synth.worldgen import SyntheticWorld, WorldConfig

    if args.job == "benchmark":
        from pushkind_crawlers_spark.plans.benchmark import run_benchmark_association

        prompt = args.benchmark_prompt or f"benchmark {args.benchmark_id}"
        out = run_benchmark_association(
            spark, SnapshotStore(args.store), args.benchmark_id, prompt,
            hub_id=args.hub_id,
        )
        print(json.dumps(out))
        if _stop_session:
            spark.stop()
        return
    if args.job == "category":
        from pushkind_crawlers_spark.plans.category import run_category_match

        pairs = [c.split(":", 1) for c in (args.categories or "1:default").split(",")]
        cats = spark.createDataFrame(
            [(int(i), n, None) for i, n in pairs],
            "category_id int, name string, embedding array<float>",
        )
        out = run_category_match(spark, SnapshotStore(args.store), cats,
                                 hub_id=args.hub_id)
        print(json.dumps(out))
        if _stop_session:
            spark.stop()
        return
    if args.job == "curate":
        from pushkind_crawlers_spark.plans.curate import run_corpus_curation

        if not args.input:
            p.error("--job curate requires --input <documents.parquet>")
        out = run_corpus_curation(
            spark, SnapshotStore(args.store),
            spark.read.parquet(args.input),
            min_tokens=args.min_tokens, min_quality=args.min_quality,
            threshold=args.jaccard_threshold,
        )
        print(json.dumps(out))
        if _stop_session:
            spark.stop()
        return

    seeds = ([u for u in args.urls.split(",") if u]
             if args.urls is not None else None)
    if args.real_sites:
        from pushkind_crawlers_spark.plans.real_sites import real_site_engine

        engine = real_site_engine(
            spark, args.store, budget_scale=args.budget_scale,
            run_id=args.run_id, seeds=seeds,
            seen_mode=args.seen_mode,
            sidecar_shards=args.sidecar_shards,
            expire_keep_last=args.expire_keep_last,
            compact_every=args.compact_every)
    else:
        world = SyntheticWorld(
            WorldConfig(seed=args.seed, n_hosts=args.hosts,
                        budget_scale=args.budget_scale)
        )
        engine = CrawlEngine(spark, world, args.store, run_id=args.run_id,
                             seeds=seeds,
                             seen_mode=args.seen_mode,
                             sidecar_shards=args.sidecar_shards,
                             expire_keep_last=args.expire_keep_last,
                             compact_every=args.compact_every)
    with RunLock(SnapshotStore(args.store)):  # G1/G2 single-writer guard
        run = engine.run(max_rounds=args.max_rounds, resume=args.resume)
    print(json.dumps({
        "run_id": run.run_id,
        "rounds": run.rounds,
        "urls_scheduled": run.total_scheduled,
        "per_round": [
            {"round": m.round, "scheduled": m.scheduled, "fetched": m.fetched,
             "links_new": m.links_new, "results_rows": m.results_rows,
             "wall_s": round(m.wall_s, 2)}
            for m in run.metrics
        ],
    }))
    if _stop_session:
        spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
