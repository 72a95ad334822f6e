"""Fixed StructType schemas for every engine table.

The reference's schema is owned by an external crate (SPEC.md:25,383-389) —
here the single source of truth is this module; readers validate against it
(no inference anywhere).
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- payload table, exactly the input_hint shape -------------------------
IMAGES = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), True),
        T.StructField("w", T.IntegerType(), True),
        T.StructField("h", T.IntegerType(), True),
        T.StructField("fmt", T.StringType(), True),
        T.StructField("caption", T.StringType(), True),
        T.StructField("phash", T.LongType(), True),
    ]
)

# --- frontier: the partitioned priority queue -----------------------------
# ord is a fixed-width hex path (4 hex digits / level) encoding deterministic
# document-order discovery; lexicographic order == BFS discovery order
# (SURVEY.md §2.7 parity definition).
FRONTIER = T.StructType(
    [
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("depth", T.IntegerType(), False),
        T.StructField("ord", T.StringType(), False),
        T.StructField("priority", T.DoubleType(), False),
        T.StructField("discovered_round", T.IntegerType(), False),
        T.StructField("parent_hash", T.LongType(), True),
    ]
)

SEEN = T.StructType(
    [
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("discovered_round", T.IntegerType(), False),
    ]
)

CRAWL_ORDER = T.StructType(
    [
        T.StructField("seq", T.LongType(), False),
        T.StructField("round", T.IntegerType(), False),
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("depth", T.IntegerType(), False),
        T.StructField("ord", T.StringType(), False),
    ]
)

# --- results: validated product rows (NewProduct, mod.rs:158-169) ---------
RESULTS = T.StructType(
    [
        T.StructField("crawler_id", T.IntegerType(), False),
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("sku", T.StringType(), False),
        T.StructField("name", T.StringType(), False),
        T.StructField("price", T.DoubleType(), False),
        T.StructField("category", T.StringType(), True),
        T.StructField("units", T.StringType(), True),
        T.StructField("amount", T.DoubleType(), True),
        T.StructField("description", T.StringType(), True),
        T.StructField("image_ids", T.ArrayType(T.StringType()), True),
        T.StructField("caption", T.StringType(), True),
        T.StructField("ord", T.StringType(), False),
        T.StructField("round", T.IntegerType(), False),
        T.StructField("embedding", T.ArrayType(T.FloatType()), True),
        T.StructField("category_id", T.IntegerType(), True),
        T.StructField("category_assignment_source", T.StringType(), True),
    ]
)

REJECTS = T.StructType(
    [
        T.StructField("url", T.StringType(), True),
        T.StructField("host", T.StringType(), True),
        T.StructField("reject_reason", T.StringType(), False),
        T.StructField("round", T.IntegerType(), False),
    ]
)

POLITENESS = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("budget_per_round", T.IntegerType(), False),
        T.StructField("robots_disallow", T.ArrayType(T.StringType()), True),
        T.StructField("crawl_delay_ms", T.IntegerType(), True),
    ]
)

SEEDS = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("priority", T.DoubleType(), True),
    ]
)

# --- per-round, per-partition lineage + metrics (north rule) ---------------
LINEAGE = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("round", T.IntegerType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("scheduled", T.LongType(), False),
        T.StructField("fetched", T.LongType(), False),
        T.StructField("fetch_errors", T.LongType(), False),
        T.StructField("links_discovered", T.LongType(), False),
        T.StructField("links_new", T.LongType(), False),
        T.StructField("links_dup", T.LongType(), False),
        T.StructField("robots_rejected", T.LongType(), False),
        T.StructField("results_rows", T.LongType(), False),
        T.StructField("reject_rows", T.LongType(), False),
    ]
)

# --- benchmark association tail (E6 / P11 / P9) ---------------------------
BENCHMARKS = T.StructType(
    [
        T.StructField("benchmark_id", T.IntegerType(), False),
        T.StructField("prompt", T.StringType(), False),
        T.StructField("embedding", T.ArrayType(T.FloatType()), True),
    ]
)

ASSOCIATIONS = T.StructType(
    [
        T.StructField("benchmark_id", T.IntegerType(), False),
        T.StructField("crawler_id", T.IntegerType(), False),
        T.StructField("product_url", T.StringType(), False),
        T.StructField("sim", T.DoubleType(), False),
        T.StructField("rank", T.IntegerType(), False),
    ]
)

BENCHMARK_STATS = T.StructType(
    [
        T.StructField("benchmark_id", T.IntegerType(), False),
        T.StructField("crawler_id", T.IntegerType(), False),
        T.StructField("num_products", T.LongType(), False),
    ]
)

# The reference's Crawler entity (src/repository/crawler.rs:10-37):
# crawlers belong to hubs, and benchmark/category jobs are scoped by
# hub_id via list_crawlers(hub_id) — products inherit their hub through
# crawler_id, so multi-tenant isolation needs no column on results.
CRAWLERS = T.StructType(
    [
        T.StructField("crawler_id", T.IntegerType(), False),
        T.StructField("hub_id", T.IntegerType(), False),
        T.StructField("selector", T.StringType(), True),
    ]
)

RUNS = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("status", T.StringType(), False),  # RUNNING|DONE|FAILED
        T.StructField("round", T.IntegerType(), False),
        T.StructField("snapshots_json", T.StringType(), True),
    ]
)

# fetch-stage output (what the mapInPandas fetcher yields per frontier row)
FETCHED = T.StructType(
    [
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("depth", T.IntegerType(), False),
        T.StructField("ord", T.StringType(), False),
        T.StructField("ok", T.BooleanType(), False),
        T.StructField("kind", T.StringType(), True),
        T.StructField("last_page", T.IntegerType(), True),
        # raw pagination-block labels; the per-site read rule (last vs
        # second-to-last, teanadin.rs:95-99) is applied downstream
        T.StructField("page_labels", T.ArrayType(T.StringType()), True),
        T.StructField("out_links", T.ArrayType(T.StringType()), True),
        T.StructField("sku", T.StringType(), True),
        T.StructField("name", T.StringType(), True),
        T.StructField("category", T.StringType(), True),
        T.StructField("units_raw", T.StringType(), True),
        T.StructField("price_str", T.StringType(), True),
        T.StructField("amount_str", T.StringType(), True),
        T.StructField("description", T.StringType(), True),
        T.StructField("variants_json", T.StringType(), True),
        T.StructField(
            "images",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("image_id", T.StringType(), False),
                        T.StructField("bytes", T.BinaryType(), True),
                        T.StructField("caption", T.StringType(), True),
                    ]
                )
            ),
            True,
        ),
    ]
)

VARIANT = T.StructType(
    [
        T.StructField("sku", T.StringType(), True),
        T.StructField("title", T.StringType(), True),
        T.StructField("price", T.DoubleType(), True),
    ]
)


# Cuckoo sidecar: one row per pmod(url_hash, n_shards) shard of the seen
# set — the incrementally-maintained membership filters (operators/seen.py),
# snapshot-committed with each round so resume rehydrates them instead of
# rebuilding from the 10^10-row seen table.
SEEN_SIDECAR = T.StructType(
    [
        T.StructField("shard", T.IntegerType(), False),
        T.StructField("words", T.BinaryType(), False),
        T.StructField("count", T.LongType(), False),
        T.StructField("degraded", T.BooleanType(), False),
    ]
)
