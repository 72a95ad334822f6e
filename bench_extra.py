#!/usr/bin/env python
"""Round-6 optimization measurement harness (guide §1).

NOT the driver bench — bench.py stays frozen. This file exists to:

* time individual headline queries against the noop sink (isolates the
  computation from the count()-based timing in bench.py, guide §1.4),
  min-of-N with job descriptions set (guide §1.5);
* dump ``explain("formatted")`` for each query to plans/r06/ so plan
  claims in OPTIMIZATION_r06.md are checkable;
* compare a query's full result against its current implementation or
  the DuckDB oracle (row-hash equality) before/after a rewrite.

Usage::

    python bench_extra.py time  [sf_dir] [query ...]      # noop-sink timing
    python bench_extra.py plans [sf_dir] [suffix] [query ...]  # explain dumps
    python bench_extra.py oracle [sf_dir] [query ...]     # vs DuckDB oracle
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPEATS = int(os.environ.get("SPARK_GRAFT_EXTRA_REPEATS", "2"))

HEADLINE = [
    "q1_pricing_summary", "q3_top_revenue", "q5_nation_revenue",
    "events_sessionize", "first_wins_dedup", "topk_per_group",
    "upsert_merge", "dedup_exact", "dedup_minhash_lsh", "dedup_simhash",
    "ngram_jaccard", "embedding_neardup", "ann_topk_cosine",
    "text_quality", "doc_fingerprint", "asof_join_attribution",
    "range_join_events", "tfidf_top_terms",
]


def _spark():
    from pushkind_crawlers_spark.session import get_spark

    return get_spark(app="bench-extra", master=f"local[{CPUS}]",
                     shuffle_partitions=max(8, CPUS))


def time_queries(sf_dir: str, names: list[str]) -> None:
    from pushkind_crawlers_spark.caching import release
    from pushkind_crawlers_spark.queries import QUERIES

    spark = _spark()
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()  # warm
    out: dict[str, dict] = {}
    for it in range(REPEATS):
        for name in names:
            spark.sparkContext.setJobDescription(f"{name} (noop, iter {it})")
            t0 = time.time()
            df = QUERIES[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = round(time.time() - t0, 3)
            release(df)
            cur = out.setdefault(name, {"samples": []})
            cur["samples"].append(dt)
            spark.sparkContext.setJobDescription(None)
    for name, cur in out.items():
        cur["min"] = min(cur["samples"])
    print(json.dumps({"sf_dir": sf_dir, "cpus": CPUS, "queries": out}))
    spark.stop()


def dump_plans(sf_dir: str, suffix: str, names: list[str]) -> None:
    from pushkind_crawlers_spark.caching import release
    from pushkind_crawlers_spark.queries import QUERIES

    spark = _spark()
    os.makedirs("plans/r06", exist_ok=True)
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        with open(f"plans/r06/{name}_{suffix}.txt", "w") as f:
            f.write(plan)
        release(df)
        print(f"plans/r06/{name}_{suffix}.txt")
    spark.stop()


def check_oracle(sf_dir: str, names: list[str]) -> None:
    """Row-set hash comparison vs the DuckDB oracle (the driver's gate
    shape: sorted row tuples, stringified, md5)."""
    import duckdb
    import hashlib

    from pushkind_crawlers_spark.caching import release
    from pushkind_crawlers_spark.queries import QUERIES, full_oracle

    spark = _spark()
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = full_oracle()
    ok = True
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        srows = sorted(tuple(r) for r in df.collect())
        release(df)
        orows = sorted(tuple(r) for r in con.execute(oracles[name]).fetchall())
        sh = hashlib.md5(repr(srows).encode()).hexdigest()
        oh = hashlib.md5(repr(orows).encode()).hexdigest()
        match = len(srows) == len(orows) and all(
            _row_eq(a, b) for a, b in zip(srows, orows))
        print(f"{name}: spark={len(srows)} oracle={len(orows)} "
              f"exact_tuple_match={sh == oh} value_match={match}")
        ok = ok and match
    spark.stop()
    sys.exit(0 if ok else 1)


def _row_eq(a, b) -> bool:
    if len(a) != len(b):
        return False
    for x, y in zip(a, b):
        if isinstance(x, float) and isinstance(y, float):
            if x != y:
                return False
        elif x != y:
            return False
    return True


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "time"
    sf = sys.argv[2] if len(sys.argv) > 2 else SF_DIR
    if cmd == "time":
        time_queries(sf, sys.argv[3:] or HEADLINE)
    elif cmd == "plans":
        suffix = sys.argv[3] if len(sys.argv) > 3 else "before"
        dump_plans(sf, suffix, sys.argv[4:] or HEADLINE)
    elif cmd == "oracle":
        check_oracle(sf, sys.argv[3:] or HEADLINE)
    else:
        raise SystemExit(f"unknown command {cmd}")
