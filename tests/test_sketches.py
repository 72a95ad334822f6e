"""Sketch operators: statistical error bounds, merge associativity, and
JVM-only plans (no value-exact oracle exists for DataSketches output, so
the contract is pinned by bounds + algebra instead)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pushkind_crawlers_spark.operators.sketches import (
    approx_quantiles,
    hll_distinct,
    hll_rollup,
    hll_sketch_per_group,
)


def _events(spark, n=200_000, users=50_000):
    return spark.range(n).select(
        (F.col("id") % 4).alias("host"),
        (F.xxhash64(F.col("id").cast("string")) % users).alias("user_id"),
        (F.col("id") % 30).alias("day"),
    )


def test_hll_error_within_bound(spark):
    """lgK=14 -> ~0.8% standard error; assert within 3 sigma of exact."""
    ev = _events(spark)
    exact = {r["host"]: r["n"] for r in
             ev.groupBy("host").agg(F.countDistinct("user_id").alias("n")).collect()}
    approx = {r["host"]: r["approx_distinct"] for r in
              hll_distinct(ev, ["host"], "user_id").collect()}
    assert set(exact) == set(approx)
    for h, n in exact.items():
        assert abs(approx[h] - n) / n < 0.025, (h, approx[h], n)


def test_hll_rollup_equals_direct_sketch(spark):
    """Union of per-(host, day) sketches == one sketch straight off the
    fact table: the merge is lossless, so incremental per-partition
    sketches answer rollups without rescanning history."""
    ev = _events(spark)
    per_day = hll_sketch_per_group(ev, ["host", "day"], "user_id")
    rolled = {r["host"]: r["approx_distinct"] for r in
              hll_rollup(per_day, ["host"]).collect()}
    direct = {r["host"]: r["approx_distinct"] for r in
              hll_distinct(ev, ["host"], "user_id").collect()}
    assert rolled == direct


def test_hll_plan_is_partial_agg_jvm(spark):
    """Fixed-size partials must merge map-side (two HashAggregate tiers)
    with no Python evaluation anywhere."""
    plan = hll_distinct(_events(spark), ["host"], "user_id")\
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("HashAggregate") >= 2 or "ObjectHashAggregate" in plan
    assert "Python" not in plan and "Arrow" not in plan


def test_approx_quantiles_rank_error(spark):
    """approx_percentile's rank error <= 1/accuracy: compare against the
    exact percentile on a skewed value column."""
    df = spark.range(100_000).select(
        (F.col("id") % 2).alias("g"),
        (F.pow(F.col("id") % 1000, 2.0)).alias("v"),
    )
    got = {r["g"]: r["quantiles"] for r in
           approx_quantiles(df, ["g"], "v", [0.5, 0.99]).collect()}
    want = {r["g"]: r["q"] for r in
            df.groupBy("g").agg(
                F.expr("percentile(v, array(0.5, 0.99))").alias("q")).collect()}
    for g in want:
        for a, b in zip(got[g], want[g]):
            # rank error 1e-4 on 50k rows/group -> a few neighboring
            # values; values are squares, so compare on rank via sqrt
            assert abs(a**0.5 - b**0.5) <= 2.0, (g, a, b)
