"""global_sequence == serial sort numbering, computed without a global window."""

from __future__ import annotations

from pyspark.sql import functions as F

from pushkind_crawlers_spark.operators.ordering import global_sequence


def test_global_sequence_matches_serial_sort(spark, tmp_path):
    df = (
        spark.range(10_000)
        .select(
            (F.col("id") % 7).cast("int").alias("depth"),
            F.lpad(F.lower(F.hex(F.xxhash64(F.col("id").cast("string")))), 16, "0").alias("ord"),
        )
    )
    path = str(tmp_path / "in")
    df.write.parquet(path)
    staged = spark.read.parquet(path)
    out = global_sequence(staged, ["depth", "ord"], base=100, n_partitions=16)
    rows = out.orderBy("seq").collect()
    assert [r["seq"] for r in rows] == list(range(101, 101 + len(rows)))
    serial = sorted(((r["depth"], r["ord"]) for r in staged.collect()))
    assert [(r["depth"], r["ord"]) for r in rows] == serial


def test_global_sequence_empty(spark, tmp_path):
    df = spark.range(0).select(
        F.col("id").cast("int").alias("depth"), F.lit("x").alias("ord")
    )
    path = str(tmp_path / "e")
    df.write.parquet(path)
    out = global_sequence(spark.read.schema(df.schema).parquet(path), ["depth", "ord"])
    assert out.count() == 0


def test_global_sequence_many_partitions_join_branch(spark, tmp_path):
    df = spark.range(5_000).select(
        F.lit(0).alias("depth"),
        F.lpad(F.col("id").cast("string"), 8, "0").alias("ord"),
    )
    path = str(tmp_path / "m")
    df.write.parquet(path)
    out = global_sequence(spark.read.parquet(path), ["depth", "ord"], n_partitions=80)
    rows = out.orderBy("seq").collect()
    assert [r["ord"] for r in rows] == [f"{i:08d}" for i in range(5_000)]
    assert [r["seq"] for r in rows] == list(range(1, 5_001))
