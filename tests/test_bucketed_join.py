"""Spark-native bucketing: the cluster path for the engine's repeated
fact-fact joins (SURVEY §1.3 — bucketed seen/results tables let per-round
joins run storage-partitioned, with no shuffle of the big side).

The snapshot store's own bucket-dir layout (store/snapshots.py) covers the
hermetic MERGE path; this test pins the SPARK-side contract: two tables
written with ``bucketBy(N, key)`` on the join key sort-merge-join with NO
Exchange on either side, and the result equals the plain join.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def no_broadcast(spark):
    """Force SMJ so the plan check exercises the bucketed-exchange
    elision, not a broadcast."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_elides_shuffle(spark, no_broadcast):
    orders = spark.range(20_000).select(
        F.col("id").alias("o_orderkey"),
        (F.col("id") % 97).alias("o_custkey"),
        (F.rand(7) * 1000).alias("o_totalprice"),
    )
    lineitem = spark.range(60_000).select(
        (F.col("id") % 20_000).alias("l_orderkey"),
        (F.col("id") % 7 + 1).cast("double").alias("l_quantity"),
        (F.rand(11) * 100).alias("l_extendedprice"),
    )
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    (orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
     .mode("overwrite").saveAsTable("b_orders"))
    (lineitem.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
     .mode("overwrite").saveAsTable("b_lineitem"))
    try:
        bo = spark.table("b_orders")
        bl = spark.table("b_lineitem")
        joined = (
            bo.join(bl, bo.o_orderkey == bl.l_orderkey)
            .groupBy("o_custkey")
            .agg(F.round(F.sum(F.col("l_quantity")), 2).alias("qty"))
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # the join itself must consume the bucketed layout directly:
        # no Exchange below the SortMergeJoin (the groupBy above it may
        # shuffle — split the plan at the join operator)
        assert "SortMergeJoin" in plan
        join_and_below = plan[plan.index("SortMergeJoin"):]
        assert "Exchange" not in join_and_below, join_and_below[:2000]

        plain = (
            orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
            .groupBy("o_custkey")
            .agg(F.round(F.sum(F.col("l_quantity")), 2).alias("qty"))
        )
        got = {(r["o_custkey"], r["qty"]) for r in joined.collect()}
        want = {(r["o_custkey"], r["qty"]) for r in plain.collect()}
        assert got == want
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_aggregation_elides_shuffle(spark, no_broadcast):
    """groupBy on the bucket key also consumes the layout: one partial
    agg per bucket, no Exchange anywhere in the plan."""
    spark.sql("DROP TABLE IF EXISTS b_li2")
    li = spark.range(30_000).select(
        (F.col("id") % 5_000).alias("l_orderkey"),
        (F.col("id") % 50).cast("double").alias("l_quantity"),
    )
    (li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
     .mode("overwrite").saveAsTable("b_li2"))
    try:
        agg = (spark.table("b_li2").groupBy("l_orderkey")
               .agg(F.sum("l_quantity").alias("qty")))
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan[:2000]
        assert agg.count() == 5_000
    finally:
        spark.sql("DROP TABLE IF EXISTS b_li2")
