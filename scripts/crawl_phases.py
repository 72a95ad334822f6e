#!/usr/bin/env python
"""Crawl round phase decomposition (r06; VERDICT r05 'Next round' #8).

Runs the bench-world synthetic crawl at one or more world scales and
prints, per round, the wall spent in each engine phase (the deltas
between the round's staging barriers, recorded in RoundMetrics.phases).
The 100x claim to check: the fixed per-round driver latency (snapshot
bookkeeping, staging job submission) amortizes as the round size grows —
throughput should rise with scale.

Usage::

    python scripts/crawl_phases.py [scale ...]     # default 0.5 1.0
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_at(scale: float) -> dict:
    os.environ["SPARK_GRAFT_BENCH_SCALE"] = str(scale)
    import importlib

    import bench
    importlib.reload(bench)
    from pushkind_crawlers_spark.plans.crawl import CrawlEngine
    from pushkind_crawlers_spark.session import get_spark
    from pushkind_crawlers_spark.synth.worldgen import SyntheticWorld

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app=f"crawl-phases-{scale}", master=f"local[{cpus}]",
                      shuffle_partitions=max(8, cpus))
    world = SyntheticWorld(bench.bench_world_cfg())
    with tempfile.TemporaryDirectory() as store:
        eng = CrawlEngine(spark, world, store)
        t0 = time.time()
        run = eng.run()
        wall = time.time() - t0
    phase_names: list[str] = []
    for m in run.metrics:
        for k in m.phases:
            if k not in phase_names:
                phase_names.append(k)
    totals = {p: round(sum(m.phases.get(p, 0.0) for m in run.metrics), 2)
              for p in phase_names}
    out = {
        "scale": scale, "cpus": cpus, "rounds": run.rounds,
        "urls_scheduled": run.total_scheduled,
        "wall_s": round(wall, 2),
        "urls_per_sec": round(run.total_scheduled / wall, 1),
        "phase_totals_s": totals,
        "per_round": [
            {"round": m.round, "scheduled": m.scheduled, **m.phases}
            for m in run.metrics
        ],
    }
    spark.stop()
    return out


if __name__ == "__main__":
    scales = [float(x) for x in sys.argv[1:]] or [0.5, 1.0]
    reports = [run_at(s) for s in scales]
    print(json.dumps({"reports": reports}))
