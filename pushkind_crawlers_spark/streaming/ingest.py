"""Structured Streaming surface of the engine.

The batch engine is BSP rounds; streaming covers the two continuous
consumers a production crawl feeds:

* **results ingest** — fetched-page rows land as files (one directory per
  round / per fetcher fleet flush); a file-source stream parses,
  validates, and first-wins-dedups them *within each micro-batch* and
  appends to the results sink. ``Trigger.AvailableNow`` drains everything
  committed so far and stops — the resumable batch-incremental pattern
  (checkpoint = exactly-once over input files).
* **event sessionization** — the streaming twin of the batch
  ``events_sessionize`` query: watermarked ``session_window`` aggregation
  with a 30-minute gap, late data bounded by the watermark.

Both are plain DataFrame transforms on an unbounded frame — identical
logic to the batch path (Spark's unified model), so correctness is
asserted against the batch query in tests.

Reference analog: the reference's ZMQ ingest loop
(/root/reference/src/main.rs:74-102) is a continuous message consumer;
this is its Spark-native shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import schemas
from ..functions.parsing import amount_col, price_col, units_col, validate_products


def results_ingest_stream(spark: SparkSession, input_dir: str) -> DataFrame:
    """File-source stream of FETCHED rows -> validated result rows.

    Parse + validate are the same JVM expressions as the batch round
    (plans/crawl.py:_build_results, without variant explosion which the
    synthetic fetcher emits pre-exploded in streaming mode).
    """
    raw = (
        spark.readStream.schema(schemas.FETCHED)
        .option("maxFilesPerTrigger", 16)
        .parquet(input_dir)
    )
    products = raw.filter((F.col("kind") == "product") & F.col("ok"))
    base = (
        products.withColumn("price", price_col(F.col("price_str")))
        .withColumn("amount", amount_col(F.col("amount_str")))
        .withColumn("units", units_col(F.col("amount_str")))
        .select(
            "url_hash", "url", "host", "sku", "name", "price",
            "category", "units", "amount", "description", "ord",
        )
    )
    valid, _ = validate_products(base)
    # intra-batch first-wins dedup: streaming dropDuplicates keeps state
    # across batches keyed on url_hash (bounded by watermark in prod)
    return valid.dropDuplicates(["url_hash"])


def start_results_ingest(spark: SparkSession, input_dir: str, out_dir: str,
                         checkpoint: str):
    """Drain all available input files into the results sink and stop
    (Trigger.AvailableNow — resumable, exactly-once over files)."""
    q = (
        results_ingest_stream(spark, input_dir)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    return q


def sessionize_stream(events: DataFrame, gap: str = "30 minutes",
                      watermark: str = "1 hour") -> DataFrame:
    """Watermarked session-window counts per user (streaming E-twin of
    queries.events_sessionize)."""
    # watermarks require TIMESTAMP (session tz pinned UTC, so NTZ casts 1:1)
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.col("user_id"), F.session_window(F.col("ts"), gap))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            "n_events",
        )
    )
