#!/usr/bin/env python
"""Hot-bucket skew draw for the LSH pair joins (VERDICT r04 #7).

Archives, in one JSON:

* walls of the REAL candidate+confirm pipeline (``ngram_jaccard_pairs``)
  on a hot corpus (one near-dup cluster holding ``hot_frac`` of the
  docs — the boilerplate/mirror shape) vs a uniform corpus of the same
  size, under the engine's shipped session config;
* whether AQE's skew split fired at this size under default thresholds
  (honest answer: local partitions are KBs, far under the 256 MB
  production threshold), plus the final-plan evidence lines from a
  thresholds-scaled run of the same join showing the split machinery
  (``SortMergeJoin(skew=true)``) — the mechanism a GB-bucket run hits
  with DEFAULT thresholds; tests/test_skew.py pins it in CI.

    python scripts/skew_evidence.py --out bench_results/skew_lsh_r05.json
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, ".")


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--cpus", default="8")
    p.add_argument("--n", type=int, default=20000)
    p.add_argument("--hot-frac", type=float, default=0.10)
    args = p.parse_args()

    from pyspark.sql import functions as F

    from pushkind_crawlers_spark.caching import release
    from pushkind_crawlers_spark.operators.dedup import ngram_jaccard_pairs
    from pushkind_crawlers_spark.session import get_spark
    from pushkind_crawlers_spark.synth.skewgen import hot_cluster_docs

    spark = get_spark(app="skew-evidence", master=f"local[{args.cpus}]",
                      shuffle_partitions=int(args.cpus) * 4)

    report = {"n_docs": args.n, "hot_frac": args.hot_frac,
              "cpus": int(args.cpus), "runs": {}}

    for name, frac in (("hot", args.hot_frac), ("uniform", 0.0)):
        pdf = hot_cluster_docs(n=args.n, hot_frac=frac)
        docs = spark.createDataFrame(pdf).repartition(int(args.cpus) * 2)
        docs.persist().count()
        t0 = time.time()
        pairs = ngram_jaccard_pairs(docs)
        n_pairs = pairs.count()
        wall = round(time.time() - t0, 2)
        plan = pairs._jdf.queryExecution().executedPlan().toString()
        release(pairs)
        docs.unpersist()
        report["runs"][name] = {
            "wall_s": wall, "confirmed_pairs": n_pairs,
            "skew_split_fired_default_conf": "skew=true" in plan,
            "cartesian_free": "CartesianProduct" not in plan,
        }

    # thresholds-scaled split evidence on the same join expression
    touched = {
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8k",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "4k",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
    }
    for k, v in touched.items():
        spark.conf.set(k, v)
    rng = np.random.default_rng(41)
    n_hot, n_cold = 5000, 24000
    sig = spark.createDataFrame(pd.DataFrame({
        "doc_id": rng.permutation(np.arange(n_hot + n_cold, dtype=np.int64)),
        "hash_idx": np.r_[np.zeros(n_hot, dtype=np.int32),
                          np.arange(n_cold, dtype=np.int32) % 8],
        "minhash": np.r_[np.full(n_hot, 0x9E3779B9, dtype=np.int64),
                         rng.integers(1 << 40, 1 << 62, n_cold)],
    }), "doc_id long, hash_idx int, minhash long").repartition(16)
    a, b = sig.alias("a"), sig.alias("b")
    j = (a.join(b, on=["hash_idx", "minhash"])
         .filter(F.col("a.doc_id") < F.col("b.doc_id"))
         .select(F.col("a.doc_id").alias("doc_a"),
                 F.col("b.doc_id").alias("doc_b")))
    qe = j._jdf.queryExecution()
    t0 = time.time()
    n = qe.toRdd().count()
    plan = qe.executedPlan().toString()
    report["forced_split"] = {
        "wall_s": round(time.time() - t0, 2),
        "rows": n,
        "skew_split_fired": "skew=true" in plan,
        "plan_evidence": [ln.strip() for ln in plan.splitlines()
                          if "skew" in ln.lower()][:6],
    }

    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({"out": args.out,
                      "hot_wall": report["runs"]["hot"]["wall_s"],
                      "uniform_wall": report["runs"]["uniform"]["wall_s"],
                      "forced_split": report["forced_split"]["skew_split_fired"]}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
