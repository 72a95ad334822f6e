"""Named query library: every SQL-expressible operator from SURVEY.md §2
plus the training-data-pipeline operators (dedup / similarity / text
analysis), each as a (spark, sf_dir) -> DataFrame callable with an exact
DuckDB oracle twin in ORACLE.

Contract (driver correctness gate): column NAMES and value semantics
must match the oracle exactly — every computed column is aliased
identically on both sides, floats are rounded to fixed decimals on both
sides, and orderings are made deterministic with explicit tie-breaks.

Scale design notes are inline per query; the common ones:
* dimension tables (region/nation/supplier/queries) are broadcast;
* aggregations are partial-agg friendly (sum/min/count — map-side combine);
* self-joins are always bucket/block-keyed, never unblocked cross joins;
* filters sit directly on the scan so parquet pushdown applies.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .functions import text as X
from .functions.parsing import amount_col, price_col, units_col, validate_products
from .operators import dedup as D
from .operators.dedup import dot_col
from .operators import similarity as S

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# =====================================================================
# TPC-H-ish headline queries (scan/agg/join shapes at scale)
# =====================================================================

def q1_pricing_summary(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q1 shape: single scan, partial-agg groupBy; the shipdate
    filter and 6-column projection push down to the parquet scan."""
    li = load(spark, sf, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-01")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
    )


SQL_Q1 = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(avg(l_quantity), 4) AS avg_qty,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-01'
GROUP BY l_returnflag, l_linestatus
"""


def q3_top_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join narrowed by segment filter; orders↔lineitem
    shuffle on orderkey; customer side reduced before the join."""
    c = load(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf, "orders")
    li = load(spark, sf, "lineitem")
    rev = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )
    return rev.orderBy(F.desc("revenue"), F.asc("l_orderkey")).limit(10)


SQL_Q3 = """
SELECT l_orderkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY l_orderkey
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


def q5_nation_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q5 shape: big fact joins + broadcast dims (nation/region)."""
    c = load(spark, sf, "customer")
    o = load(spark, sf, "orders")
    li = load(spark, sf, "lineitem")
    n = F.broadcast(load(spark, sf, "nation"))
    r = F.broadcast(load(spark, sf, "region"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


SQL_Q5 = """
SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY n_name
"""


def events_sessionize(spark: SparkSession, sf: str) -> DataFrame:
    """Sessionization (batch twin of the streaming path): gap > 1800s starts
    a new session; single shuffle on user_id (window + groupBy colocated)."""
    ev = load(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = F.col("ts").cast("timestamp").cast("long")
    gap = epoch - F.lag(epoch).over(w)
    sess = ev.withColumn("new_sess", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0))
    return sess.groupBy("user_id").agg(
        F.sum("new_sess").alias("n_sessions"),
        F.count("*").alias("n_events"),
    )


SQL_SESSIONIZE = """
WITH g AS (
  SELECT user_id,
         CASE WHEN CAST(floor(epoch(ts)) AS BIGINT)
                   - lag(CAST(floor(epoch(ts)) AS BIGINT))
                     OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   IS NULL
               OR CAST(floor(epoch(ts)) AS BIGINT)
                   - lag(CAST(floor(epoch(ts)) AS BIGINT))
                     OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > 1800
              THEN 1 ELSE 0 END AS new_sess
  FROM events
)
SELECT user_id, CAST(sum(new_sess) AS BIGINT) AS n_sessions, count(*) AS n_events
FROM g GROUP BY user_id
"""


def rollup_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """ROLLUP aggregation (subtotal + grand-total rows)."""
    li = load(spark, sf, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


SQL_ROLLUP = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
"""


def exact_percentile(spark: SparkSession, sf: str) -> DataFrame:
    """Exact continuous percentiles per group (no sketch)."""
    o = load(spark, sf, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90"),
    )


SQL_PERCENTILE = """
SELECT o_orderpriority,
       round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
       round(quantile_cont(o_totalprice, 0.9), 4) AS p90
FROM orders GROUP BY o_orderpriority
"""


def corr_subquery_acctbal(spark: SparkSession, sf: str) -> DataFrame:
    """Correlated-subquery shape: customers above their nation's average
    balance (decorrelated to a join+agg by both planners)."""
    c = load(spark, sf, "customer")
    avg_n = c.groupBy("c_nationkey").agg(F.avg("c_acctbal").alias("nation_avg"))
    return (
        c.join(avg_n, "c_nationkey")
        .filter(F.col("c_acctbal") > F.col("nation_avg"))
        .select("c_custkey", F.round("c_acctbal", 2).alias("acctbal"))
    )


SQL_CORR_SUBQUERY = """
SELECT c_custkey, round(c_acctbal, 2) AS acctbal
FROM customer c
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer i
                   WHERE i.c_nationkey = c.c_nationkey)
"""


def ntile_decile(spark: SparkSession, sf: str) -> DataFrame:
    """Decile assignment over a deterministic total order."""
    o = load(spark, sf, "orders")
    w = Window.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return o.select("o_orderkey", F.ntile(10).over(w).alias("decile"))


SQL_NTILE = """
SELECT o_orderkey,
       ntile(10) OVER (ORDER BY o_totalprice DESC, o_orderkey ASC) AS decile
FROM orders
"""


def distinct_parts(spark: SparkSession, sf: str) -> DataFrame:
    """Exact distinct count per group (two-level hash aggregate)."""
    li = load(spark, sf, "lineitem")
    return li.groupBy("l_suppkey").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.count("*").alias("n_rows"),
    )


SQL_DISTINCT_PARTS = """
SELECT l_suppkey, count(DISTINCT l_partkey) AS n_parts, count(*) AS n_rows
FROM lineitem GROUP BY l_suppkey
"""


# =====================================================================
# Crawl-operator parity queries (SURVEY.md §2.1/2.2/2.3 SQL-expressible)
# =====================================================================

def first_wins_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """F4/F8 first-wins dedup: first lineitem per orderkey in linenumber
    order (the crawl's discovery-order dedup).

    r06 shape (guide §2.3 — aggregate before you shuffle): the window's
    row_number()=1 is exactly min(struct(ordering cols)) per key —
    struct comparison is lexicographic — so a partial-agg groupBy
    replaces shuffle-the-table + two sorts (the r05 plan was
    Sort→WindowGroupLimit→Exchange→Sort→Window); map-side combine
    collapses each order's lines before the exchange."""
    li = load(spark, sf, "lineitem")
    first = li.groupBy("l_orderkey").agg(
        F.min(F.struct("l_linenumber", "l_partkey", "l_suppkey")).alias("s")
    )
    return first.select(
        "l_orderkey", F.col("s.l_partkey").alias("l_partkey"),
        F.col("s.l_linenumber").alias("l_linenumber"),
    )


SQL_FIRST_WINS = """
SELECT l_orderkey, l_partkey, l_linenumber
FROM (SELECT l_orderkey, l_partkey, l_linenumber,
             row_number() OVER (PARTITION BY l_orderkey
                                ORDER BY l_linenumber, l_partkey, l_suppkey) AS rn
      FROM lineitem)
WHERE rn = 1
"""


def pagination_expand(spark: SparkSession, sf: str) -> DataFrame:
    """F2 pagination synthesis: explode sequence(2..last_page) and rewrite
    the page param (wintergreen.rs:78-129), p_size standing in for the
    last-page read."""
    p = load(spark, sf, "part").filter(F.col("p_size") >= 2)
    return (
        p.select(
            "p_partkey",
            F.explode(F.sequence(F.lit(2), F.least(F.col("p_size"), F.lit(6)))).alias("page_no"),
        )
        .withColumn(
            "page_url",
            F.concat(F.lit("https://site/part/"), F.col("p_partkey").cast("string"),
                     F.lit("?PAGEN_1="), F.col("page_no").cast("string")),
        )
    )


SQL_PAGINATION = """
SELECT p_partkey, page_no,
       'https://site/part/' || CAST(p_partkey AS VARCHAR) || '?PAGEN_1=' || CAST(page_no AS VARCHAR) AS page_url
FROM part, UNNEST(generate_series(2, least(p_size, 6))) AS t(page_no)
WHERE p_size >= 2
"""


def anti_join_new(spark: SparkSession, sf: str) -> DataFrame:
    """F4 seen-filter shape: candidates anti-joined against the seen set —
    orders whose customer is NOT in the 'seen' (BUILDING) segment."""
    seen = load(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf, "orders")
    return o.join(seen, o.o_custkey == seen.c_custkey, "left_anti").select(
        "o_orderkey", "o_custkey"
    )


SQL_ANTI_JOIN = """
SELECT o_orderkey, o_custkey FROM orders
WHERE o_custkey NOT IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
"""


def topk_per_group(spark: SparkSession, sf: str) -> DataFrame:
    """E4/E6 top-k per group: top-3 orders by totalprice per customer."""
    o = load(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("o_custkey", "o_orderkey", "rank")
    )


SQL_TOPK_GROUP = """
SELECT o_custkey, o_orderkey, rank FROM (
  SELECT o_custkey, o_orderkey,
         row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank
  FROM orders)
WHERE rank <= 3
"""


def threshold_filter(spark: SparkSession, sf: str) -> DataFrame:
    """E5 similarity threshold: normalized score >= 0.8 (lib.rs:7)."""
    o = load(spark, sf, "orders")
    mx = o.agg(F.max("o_totalprice").alias("mx"))
    return (
        o.crossJoin(F.broadcast(mx))
        .withColumn("sim", F.round(F.col("o_totalprice") / F.col("mx"), 4))
        .filter(F.col("sim") >= 0.8)
        .select("o_orderkey", "sim")
    )


SQL_THRESHOLD = """
SELECT o_orderkey, round(o_totalprice / (SELECT max(o_totalprice) FROM orders), 4) AS sim
FROM orders
WHERE round(o_totalprice / (SELECT max(o_totalprice) FROM orders), 4) >= 0.8
"""


def upsert_merge(spark: SparkSession, sf: str) -> DataFrame:
    """P3 MERGE-upsert semantics (product.rs:116-143): a batch of changed
    rows (orderkey%10==0, price doubled) + new rows (key+1000000) merged
    into the base — matched rows updated, unmatched inserted."""
    o = load(spark, sf, "orders").select("o_orderkey", "o_totalprice")
    batch = (
        o.filter(F.col("o_orderkey") % 10 == 0)
        .select(
            F.col("o_orderkey").alias("k"),
            F.round(F.col("o_totalprice") * 2, 2).alias("v"),
        )
        .unionByName(
            o.filter(F.col("o_orderkey") % 100 == 0).select(
                (F.col("o_orderkey") + 1000000).alias("k"),
                F.round(F.col("o_totalprice"), 2).alias("v"),
            )
        )
    )
    merged = (
        o.join(batch, o.o_orderkey == batch.k, "full_outer")
        .select(
            F.coalesce(F.col("o_orderkey"), F.col("k")).alias("o_orderkey"),
            F.round(F.coalesce(F.col("v"), F.col("o_totalprice")), 2).alias("o_totalprice"),
        )
    )
    return merged


SQL_UPSERT = """
WITH batch AS (
  SELECT o_orderkey AS k, round(o_totalprice * 2, 2) AS v FROM orders WHERE o_orderkey % 10 = 0
  UNION ALL
  SELECT o_orderkey + 1000000 AS k, round(o_totalprice, 2) AS v FROM orders WHERE o_orderkey % 100 = 0
)
SELECT coalesce(o_orderkey, k) AS o_orderkey,
       round(coalesce(v, o_totalprice), 2) AS o_totalprice
FROM orders FULL OUTER JOIN batch ON o_orderkey = k
"""


def count_stats(spark: SparkSession, sf: str) -> DataFrame:
    """P8 update_crawler_stats: COUNT(*) + freshest timestamp per group."""
    li = load(spark, sf, "lineitem")
    return li.groupBy("l_suppkey").agg(
        F.count("*").alias("num_products"),
        F.max(F.col("l_shipdate").cast("date")).alias("updated_at"),
    )


SQL_COUNT_STATS = """
SELECT l_suppkey, count(*) AS num_products, CAST(max(l_shipdate) AS DATE) AS updated_at
FROM lineitem GROUP BY l_suppkey
"""


def manual_guard_update(spark: SparkSession, sf: str) -> DataFrame:
    """P12 conditional update that never overwrites 'manual' rows
    (category.rs:54-79): BUILDING stands in for manual."""
    c = load(spark, sf, "customer")
    return c.select(
        "c_custkey",
        F.when(F.col("c_mktsegment") != "BUILDING", F.lit("AUTO"))
        .otherwise(F.col("c_mktsegment"))
        .alias("segment_out"),
    )


SQL_MANUAL_GUARD = """
SELECT c_custkey,
       CASE WHEN c_mktsegment != 'BUILDING' THEN 'AUTO' ELSE c_mktsegment END AS segment_out
FROM customer
"""


def cascade_delete(spark: SparkSession, sf: str) -> DataFrame:
    """P5 cascade delete: drop children of deleted parents (orders with
    status 'F' deleted), count survivors per returnflag."""
    o = load(spark, sf, "orders").filter(F.col("o_orderstatus") == "F")
    li = load(spark, sf, "lineitem")
    kept = li.join(o, li.l_orderkey == o.o_orderkey, "left_anti")
    return kept.groupBy("l_returnflag").agg(F.count("*").alias("remaining"))


SQL_CASCADE_DELETE = """
SELECT l_returnflag, count(*) AS remaining
FROM lineitem
WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F')
GROUP BY l_returnflag
"""


def breadcrumb_join(spark: SparkSession, sf: str) -> DataFrame:
    """F6 breadcrumb assembly: ordered collect + ' / ' join
    (wintergreen.rs:221-226)."""
    li = load(spark, sf, "lineitem")
    return li.groupBy("l_orderkey").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("l_linenumber"))),
                lambda x: x["l_linenumber"].cast("string"),
            ),
            " / ",
        ).alias("crumbs")
    )


SQL_BREADCRUMB = """
SELECT l_orderkey, string_agg(CAST(l_linenumber AS VARCHAR), ' / ' ORDER BY l_linenumber) AS crumbs
FROM lineitem GROUP BY l_orderkey
"""


def price_cleanup(spark: SparkSession, sf: str) -> DataFrame:
    """S3 price-string cleanup parity: comma-decimal strings parsed back
    (wintergreen.rs:229-242) — strings synthesized from l_extendedprice."""
    li = load(spark, sf, "lineitem")
    raw = F.translate(F.col("l_extendedprice").cast("string"), ".", ",")
    return li.select(
        "l_orderkey", "l_linenumber",
        F.round(price_col(raw), 2).alias("price"),
    )


SQL_PRICE_CLEANUP = """
SELECT l_orderkey, l_linenumber,
       round(CAST(replace(replace(CAST(l_extendedprice AS VARCHAR), '.', ','), ',', '.') AS DOUBLE), 2) AS price
FROM lineitem
"""


def amount_units_parse(spark: SparkSession, sf: str) -> DataFrame:
    """S2 amount/units regex parity (mod.rs:172-214) on synthesized
    '<qty>kg' strings."""
    li = load(spark, sf, "lineitem")
    raw = F.concat(F.col("l_quantity").cast("int").cast("string"), F.lit("kg"))
    return li.select(
        "l_orderkey", "l_linenumber",
        amount_col(raw).alias("amount"),
        units_col(raw).alias("units"),
    )


SQL_AMOUNT_UNITS = """
SELECT l_orderkey, l_linenumber,
       CAST(regexp_extract(CAST(CAST(l_quantity AS INT) AS VARCHAR) || 'kg', '^\\s*(\\d+(?:[.,]\\d+)?)([a-zа-я%]*)\\s*$', 1) AS DOUBLE) AS amount,
       regexp_extract(CAST(CAST(l_quantity AS INT) AS VARCHAR) || 'kg', '^\\s*(\\d+(?:[.,]\\d+)?)([a-zа-я%]*)\\s*$', 2) AS units
FROM lineitem
"""


def variant_explode(spark: SparkSession, sf: str) -> DataFrame:
    """F7 variant explosion stand-in: extract the numeric variant key from
    the JSON props column (rusteaco.rs:273-291 shape)."""
    ev = load(spark, sf, "events")
    return ev.select(
        "event_id",
        F.regexp_extract(F.col("props"), r"(\d+)", 1).cast("int").alias("variant_k"),
        F.concat(F.lit("evt-"), F.col("event_id").cast("string"), F.lit("#"),
                 F.regexp_extract(F.col("props"), r"(\d+)", 1)).alias("variant_url"),
    )


SQL_VARIANT = """
SELECT event_id,
       CAST(regexp_extract(props, '(\\d+)', 1) AS INTEGER) AS variant_k,
       'evt-' || CAST(event_id AS VARCHAR) || '#' || regexp_extract(props, '(\\d+)', 1) AS variant_url
FROM events
"""


def run_state_guard(spark: SparkSession, sf: str) -> DataFrame:
    """G3 has_any_processing: count running jobs per group
    (category.rs:109-131) — open orders per priority class."""
    o = load(spark, sf, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.sum(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0)).alias("n_running"),
        (F.sum(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0)) > 0).alias("has_running"),
    )


SQL_RUN_STATE = """
SELECT o_orderpriority,
       CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_running,
       sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) > 0 AS has_running
FROM orders GROUP BY o_orderpriority
"""


def prompt_template(spark: SparkSession, sf: str) -> DataFrame:
    """S7 prompt template: the 7-field newline-joined embedding prompt
    (embedding.rs:11-23; golden string benchmark.rs:198-212) over part
    columns. Price/amount go through a decimal(18,2)/int cast so the
    string rendering is dialect-identical."""
    p = load(spark, sf, "part")
    price_s = F.round(F.col("p_retailprice"), 2).cast("decimal(18,2)").cast("string")
    return p.select(
        "p_partkey",
        S.prompt_col(
            F.col("p_name"), F.col("p_partkey").cast("string"),
            F.col("p_type"), F.col("p_brand"),
            price_s, F.col("p_size").cast("string"), F.col("p_name"),
        ).alias("prompt"),
    )


SQL_PROMPT = """
SELECT p_partkey,
       'Name: ' || coalesce(p_name, '') || chr(10) ||
       'SKU: ' || coalesce(CAST(p_partkey AS VARCHAR), '') || chr(10) ||
       'Category: ' || coalesce(p_type, '') || chr(10) ||
       'Units: ' || coalesce(p_brand, '') || chr(10) ||
       'Price: ' || coalesce(CAST(CAST(round(p_retailprice, 2) AS DECIMAL(18,2)) AS VARCHAR), '') || chr(10) ||
       'Amount: ' || coalesce(CAST(p_size AS VARCHAR), '') || chr(10) ||
       'Description: ' || coalesce(p_name, '') AS prompt
FROM part
"""


def replace_children_q(spark: SparkSession, sf: str) -> DataFrame:
    """P4 replace_product_images semantics (product.rs:18-45): delete all
    children of the target parents, insert the fresh batch — one anti-join
    + union, shuffling on the parent key only."""
    o = load(spark, sf, "orders")
    li = load(spark, sf, "lineitem")
    parents = o.filter(F.col("o_orderkey") % 50 == 0).select(
        F.col("o_orderkey").alias("pk")
    )
    survivors = li.join(parents, li.l_orderkey == parents.pk, "left_anti").select(
        "l_orderkey", "l_linenumber", F.round("l_quantity", 2).alias("qty")
    )
    fresh = parents.select(
        F.col("pk").alias("l_orderkey"),
        F.lit(0).alias("l_linenumber"),
        F.lit(1.0).alias("qty"),
    )
    return survivors.unionByName(fresh)


SQL_REPLACE_CHILDREN = """
SELECT l_orderkey, l_linenumber, round(l_quantity, 2) AS qty FROM lineitem
WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders WHERE o_orderkey % 50 = 0)
UNION ALL
SELECT o_orderkey AS l_orderkey, 0 AS l_linenumber, 1.0 AS qty
FROM orders WHERE o_orderkey % 50 = 0
"""


def clear_categories_q(spark: SparkSession, sf: str) -> DataFrame:
    """P13 clear_product_categories_by_crawler with the manual guard
    (category.rs:81-105), run through the real store operator: nation 5
    stands in for the crawler, BUILDING rows are 'manual'."""
    from .store.ops import clear_categories_guarded

    c = load(spark, sf, "customer")
    r = c.select(
        "c_custkey",
        F.col("c_nationkey").cast("int").alias("crawler_id"),
        F.col("c_mktsegment").alias("category_id"),
        F.when(F.col("c_mktsegment") == "BUILDING", F.lit("manual"))
        .otherwise(F.lit("automatic")).alias("category_assignment_source"),
    )
    out = clear_categories_guarded(r, crawler_id=5)
    return out.select(
        "c_custkey",
        F.col("category_id").alias("category_out"),
        F.col("category_assignment_source").alias("source_out"),
    )


SQL_CLEAR_CATEGORIES = """
SELECT c_custkey,
       CASE WHEN c_nationkey = 5 AND c_mktsegment != 'BUILDING' THEN NULL
            ELSE c_mktsegment END AS category_out,
       CASE WHEN c_nationkey = 5 AND c_mktsegment != 'BUILDING' THEN NULL
            WHEN c_mktsegment = 'BUILDING' THEN 'manual'
            ELSE 'automatic' END AS source_out
FROM customer
"""


def assoc_replace(spark: SparkSession, sf: str) -> DataFrame:
    """P11 benchmark-association replacement (benchmark.rs:49-83,107-110):
    remove_benchmark_associations for benchmark 7, then insert its fresh
    top-10 — everyone else's rows pass through untouched."""
    li = load(spark, sf, "lineitem").select(
        F.col("l_suppkey").alias("benchmark_id"),
        F.col("l_partkey").alias("product_key"),
        F.round("l_discount", 2).alias("distance"),
        "l_extendedprice", "l_orderkey", "l_linenumber",
    )
    keep = li.filter(F.col("benchmark_id") != 7)
    w = Window.orderBy(
        F.desc("l_extendedprice"), F.asc("l_orderkey"), F.asc("l_linenumber")
    )
    fresh = (
        li.filter(F.col("benchmark_id") == 7)
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 10)
    )
    cols = ["benchmark_id", "product_key", "distance"]
    return keep.select(*cols).unionByName(fresh.select(*cols))


SQL_ASSOC_REPLACE = """
SELECT l_suppkey AS benchmark_id, l_partkey AS product_key,
       round(l_discount, 2) AS distance
FROM lineitem WHERE l_suppkey != 7
UNION ALL
SELECT benchmark_id, product_key, distance FROM (
  SELECT l_suppkey AS benchmark_id, l_partkey AS product_key,
         round(l_discount, 2) AS distance,
         row_number() OVER (ORDER BY l_extendedprice DESC, l_orderkey ASC,
                            l_linenumber ASC) AS rnk
  FROM lineitem WHERE l_suppkey = 7)
WHERE rnk <= 10
"""


def append_commit_counts(spark: SparkSession, sf: str) -> DataFrame:
    """P2 create_products atomic batch append (product.rs:91-114) through
    the REAL snapshot store: base commit, batch append commit, read the
    resulting snapshot back — per-group row conservation is the check."""
    import tempfile

    from .store.snapshots import SnapshotStore

    o = load(spark, sf, "orders").select("o_orderkey", "o_orderpriority")
    store = SnapshotStore(tempfile.mkdtemp(prefix="p2-gate-"))
    tbl = store.table("orders_gate", o.schema)
    tbl.commit(o)
    batch = o.filter(F.col("o_orderkey") % 10 == 0).select(
        (F.col("o_orderkey") + 3000000).alias("o_orderkey"), "o_orderpriority"
    )
    tbl.append(spark, batch)
    return tbl.read(spark).groupBy("o_orderpriority").agg(
        F.count("*").alias("n_rows")
    )


SQL_APPEND_COMMIT = """
WITH unioned AS (
  SELECT o_orderkey, o_orderpriority FROM orders
  UNION ALL
  SELECT o_orderkey + 3000000, o_orderpriority FROM orders WHERE o_orderkey % 10 = 0
)
SELECT o_orderpriority, count(*) AS n_rows FROM unioned GROUP BY o_orderpriority
"""


def validation_split(spark: SparkSession, sf: str) -> DataFrame:
    """S1 build_new_product validation (mod.rs:50-170) through the real
    validate_products operator: dirty rows synthesized from customer,
    output = one row per input with its reject reason ('ok' if kept) and
    the normalized units/amount on the kept side."""
    c = load(spark, sf, "customer")
    raw = c.select(
        "c_custkey",
        F.when(F.col("c_custkey") % 97 == 0, F.lit("")).otherwise(F.col("c_name")).alias("sku"),
        F.when(F.col("c_custkey") % 89 == 0, F.lit("  ")).otherwise(F.col("c_name")).alias("name"),
        F.concat(F.lit("u-"), F.col("c_custkey").cast("string")).alias("url"),
        F.round(F.col("c_acctbal"), 2).alias("price"),
        F.when(F.col("c_custkey") % 11 == 0, F.lit(0.0))
        .otherwise((F.col("c_custkey") % 5).cast("double") + 0.5).alias("amount"),
        F.when(F.col("c_custkey") % 7 == 0, F.lit(" ")).otherwise(F.lit("kg")).alias("units"),
        F.lit("cat").alias("category"),
        F.lit(None).cast("string").alias("description"),
    )
    valid, rejects = validate_products(raw)
    v = valid.select("c_custkey", F.lit("ok").alias("status"), "units", "amount")
    r = rejects.select(
        "c_custkey", F.col("reject_reason").alias("status"), "units", "amount"
    )
    return v.unionByName(r)


SQL_VALIDATION_SPLIT = """
WITH raw AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 97 = 0 THEN '' ELSE c_name END AS sku,
         CASE WHEN c_custkey % 89 = 0 THEN '  ' ELSE c_name END AS name,
         round(c_acctbal, 2) AS price,
         CASE WHEN c_custkey % 11 = 0 THEN 0.0
              ELSE CAST(c_custkey % 5 AS DOUBLE) + 0.5 END AS amount,
         CASE WHEN c_custkey % 7 = 0 THEN ' ' ELSE 'kg' END AS units
  FROM customer
), tagged AS (
  SELECT *,
         CASE WHEN trim(sku) = '' THEN 'invalid_sku'
              WHEN trim(name) = '' THEN 'invalid_name'
              WHEN price < 0 THEN 'invalid_price' END AS rr
  FROM raw
)
SELECT c_custkey,
       coalesce(rr, 'ok') AS status,
       CASE WHEN rr IS NULL
            THEN (CASE WHEN trim(units) = '' THEN NULL ELSE trim(units) END)
            ELSE units END AS units,
       CASE WHEN rr IS NULL THEN (CASE WHEN amount > 0 THEN amount END)
            ELSE amount END AS amount
FROM tagged
"""


# =====================================================================
# Training-data pipeline: dedup / similarity / text analysis
# =====================================================================

def dedup_exact(spark: SparkSession, sf: str) -> DataFrame:
    return D.exact_dedup(load(spark, sf, "documents"))


def dedup_minhash_lsh(spark: SparkSession, sf: str) -> DataFrame:
    return D.lsh_candidate_pairs(load(spark, sf, "documents"))


def dedup_simhash(spark: SparkSession, sf: str) -> DataFrame:
    return D.simhash(load(spark, sf, "documents"))


def simhash_near_pairs(spark: SparkSession, sf: str) -> DataFrame:
    return D.simhash_near_pairs(load(spark, sf, "documents"))


def ngram_jaccard(spark: SparkSession, sf: str) -> DataFrame:
    return D.ngram_jaccard_pairs(load(spark, sf, "documents"), threshold=0.2)


def embedding_neardup(spark: SparkSession, sf: str) -> DataFrame:
    return D.embedding_neardup_pairs(load(spark, sf, "embeddings"), threshold=0.2)


def ann_topk_cosine(spark: SparkSession, sf: str) -> DataFrame:
    """Exact brute-force cosine top-10 vs the vec_id=0 query vector.

    The query row joins in as a broadcast (no literal capture — the same
    SQL works at any sf)."""
    emb = load(spark, sf, "embeddings")
    q = F.broadcast(
        emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q_vec"))
    )
    scored = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(q)
        .select(
            "vec_id",
            F.round(dot_col(F.col("embedding"), F.col("q_vec")), 4).alias("cosine"),
        )
    )
    # TakeOrdered top-k (distributed), then rank the k survivors
    top = scored.orderBy(F.desc("cosine"), F.asc("vec_id")).limit(10)
    w = Window.orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        top.withColumn("rank", F.row_number().over(w))
        .select("vec_id", "cosine", "rank")
    )


SQL_ANN_TOPK = """
WITH q AS (SELECT embedding AS q_vec FROM embeddings WHERE vec_id = 0),
scored AS (
  SELECT vec_id, round(SUM(CAST(embedding[i] AS DOUBLE) * CAST(q_vec[i] AS DOUBLE)), 4) AS cosine
  FROM embeddings, q, UNNEST(generate_series(1, len(embedding))) AS t(i)
  WHERE vec_id != 0
  GROUP BY vec_id
)
SELECT vec_id, cosine, rank FROM (
  SELECT vec_id, cosine, row_number() OVER (ORDER BY cosine DESC, vec_id ASC) AS rank
  FROM scored)
WHERE rank <= 10
"""


def text_lang_id(spark: SparkSession, sf: str) -> DataFrame:
    d = load(spark, sf, "documents")
    return d.select("doc_id", X.lang_id_col(F.col("text")).alias("pred_lang"))


def text_quality(spark: SparkSession, sf: str) -> DataFrame:
    d = load(spark, sf, "documents")
    return d.select("doc_id", X.quality_score_col(F.col("text")).alias("quality"))


def text_token_count(spark: SparkSession, sf: str) -> DataFrame:
    d = load(spark, sf, "documents")
    return d.select("doc_id", X.token_count_col(F.col("text")).cast("long").alias("n_tokens"))


def doc_fingerprint(spark: SparkSession, sf: str) -> DataFrame:
    d = load(spark, sf, "documents")
    return d.select("doc_id", X.fingerprint_col(F.col("text")).alias("fingerprint"))


SQL_LANG_ID = f"SELECT doc_id, {X.lang_id_sql('text')} AS pred_lang FROM documents"
SQL_QUALITY = f"SELECT doc_id, {X.quality_score_sql('text')} AS quality FROM documents"
SQL_TOKEN_COUNT = f"SELECT doc_id, CAST({X.token_count_sql('text')} AS BIGINT) AS n_tokens FROM documents"
SQL_FINGERPRINT = f"SELECT doc_id, {X.fingerprint_sql('text')} AS fingerprint FROM documents"


# =====================================================================
# Non-SQL-expressible (rows-only driver check): UDF-backed scale paths
# =====================================================================

def ann_lsh_topk_q(spark: SparkSession, sf: str) -> DataFrame:
    """Approximate ANN via random-hyperplane LSH buckets (scale path of
    ann_topk_cosine). Fully SQL-twinned: the seeded hyperplanes are
    embedded as literals in the oracle, which recomputes the query
    signature, the Hamming<=1 multiprobe candidate set, and the scored
    top-k — the approximation itself is verified, not just row counts."""
    emb = load(spark, sf, "embeddings")
    qrow = emb.filter(F.col("vec_id") == 0).select("embedding").first()
    return S.ann_lsh_topk(
        emb.filter(F.col("vec_id") != 0), list(qrow[0]), k=10, n_planes=6
    )


def _ann_lsh_sql(k: int = 10, n_planes: int = 6, seed: int = 7,
                 dim: int = 64, multiprobe: int = 1) -> str:
    from .operators.dedup import plane_sig_sql

    planes = S.hyperplanes(dim, n_planes, seed)
    return f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
qsig AS (SELECT {plane_sig_sql(planes, 'qv')} AS qs FROM q),
bkt AS (
  SELECT vec_id, embedding, {plane_sig_sql(planes, 'embedding')} AS sig
  FROM embeddings WHERE vec_id != 0
), cand AS (
  SELECT b.vec_id, b.embedding
  FROM bkt b, qsig
  WHERE bit_count(CAST(xor(CAST(b.sig AS BIGINT), CAST(qsig.qs AS BIGINT)) AS BIGINT)) <= {multiprobe}
), scored AS (
  SELECT c.vec_id,
         round(SUM(CAST(c.embedding[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)), 4) AS cosine
  FROM cand c, q, UNNEST(generate_series(1, len(c.embedding))) AS t(i)
  GROUP BY c.vec_id
)
SELECT vec_id, cosine, rank FROM (
  SELECT vec_id, cosine,
         row_number() OVER (ORDER BY cosine DESC, vec_id ASC) AS rank
  FROM scored)
WHERE rank <= {k}
"""


def ann_ivf_topk_q(spark: SparkSession, sf: str) -> DataFrame:
    """IVF ANN with full probing (n_probe == n_centroids): exercises the
    whole IVF pipeline — deterministic sample, k-means training, the
    vectorized centroid-assignment UDF, bucket filter, scoring — and is
    provably equal to the exact top-k (partition completeness), so the
    exact-top-k SQL is its oracle. The recall bound for PARTIAL probing
    (n_probe=3) is asserted in tests/test_similarity.py."""
    emb = load(spark, sf, "embeddings")
    qrow = emb.filter(F.col("vec_id") == 0).select("embedding").first()
    return S.ann_ivf_topk(
        emb.filter(F.col("vec_id") != 0), list(qrow[0]), k=10,
        n_centroids=16, n_probe=16,
    )


def embed_fill_q(spark: SparkSession, sf: str) -> DataFrame:
    """E3 memoized embedding fill over documents via the deterministic
    hash embedder (embedding.rs:41-65 pattern). The oracle twin recomputes
    the embedder EXACTLY in SQL: md5-LE-uint64 token digests, signed
    bucket counts, L2 norm, float32 quantization — so comp0 matches to
    the last bit (bucket sums are exact integers in double; IEEE sqrt and
    the REAL cast are deterministic on both engines)."""
    d = load(spark, sf, "documents").select(
        "doc_id", F.col("text").alias("prompt"),
        F.lit(None).cast("array<float>").alias("embedding"),
    )
    filled = S.fill_missing_embeddings(d)
    return filled.select(
        "doc_id",
        F.round(F.col("embedding")[0].cast("double"), 4).alias("comp0"),
        F.round(dot_col(F.col("embedding"), F.col("embedding")), 2).alias("norm_sq"),
    )


# md5 digest[:8] interpreted little-endian (numpy native) as uint64
_MD5_LE64 = ("('0x' || substr(md5(tok),15,2) || substr(md5(tok),13,2) || "
             "substr(md5(tok),11,2) || substr(md5(tok),9,2) || "
             "substr(md5(tok),7,2) || substr(md5(tok),5,2) || "
             "substr(md5(tok),3,2) || substr(md5(tok),1,2))")

SQL_EMBED_FILL = f"""
WITH toks AS (
  SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x != '')) AS tok
  FROM documents
), tb AS (
  SELECT doc_id, CAST({_MD5_LE64} AS UBIGINT) AS dg FROM toks
), sb AS (
  SELECT doc_id, CAST(dg % 64 AS INTEGER) AS bucket,
         SUM(CASE WHEN (dg >> 32) & 1 = 1 THEN 1.0 ELSE -1.0 END) AS s
  FROM tb GROUP BY doc_id, bucket
), nrm AS (
  SELECT doc_id, sqrt(SUM(s * s)) AS nn FROM sb GROUP BY doc_id
), comps AS (
  SELECT sb.doc_id, sb.bucket,
         CAST(CASE WHEN nrm.nn > 0 THEN sb.s / nrm.nn ELSE 0.0 END AS REAL) AS comp
  FROM sb JOIN nrm ON sb.doc_id = nrm.doc_id
), agg AS (
  SELECT doc_id,
         round(SUM(CAST(comp AS DOUBLE) * CAST(comp AS DOUBLE)), 2) AS norm_sq
  FROM comps GROUP BY doc_id
)
SELECT d.doc_id,
       round(CAST(COALESCE(c0.comp, CAST(0.0 AS REAL)) AS DOUBLE), 4) AS comp0,
       COALESCE(a.norm_sq, 0.0) AS norm_sq
FROM documents d
LEFT JOIN agg a ON a.doc_id = d.doc_id
LEFT JOIN (SELECT doc_id, comp FROM comps WHERE bucket = 0) c0 ON c0.doc_id = d.doc_id
"""


def multimodal_features_q(spark: SparkSession, sf: str) -> DataFrame:
    """Image decode + feature extraction over an opaque binary column
    (input_hint payload shape) with a PNG / LJQ1-lossy format mix —
    every third image goes through the lossy DCT-quantized codec. The
    oracle is a literal table precomputed by the pure-Python codec twin
    (same numpy ops, bit-identical features), so the driver gate checks
    the decoded values, not just row counts."""
    import pandas as pd

    from .operators.multimodal import extract_image_features
    from .synth.worldgen import make_image_bytes

    def gen(batches):
        for pdf in batches:
            rows = {"image_id": [], "bytes": [], "fmt": []}
            for i in pdf["id"].tolist():
                image_id = f"img-q-{i:05d}"
                fmt = "jpg" if i % 3 == 0 else "png"
                rows["image_id"].append(image_id)
                rows["bytes"].append(make_image_bytes(13, image_id, (32,), fmt=fmt))
                rows["fmt"].append(fmt)
            yield pd.DataFrame(rows)

    imgs = spark.range(256).repartition(8).mapInPandas(
        gen, "image_id string, bytes binary, fmt string"
    )
    return extract_image_features(imgs).select(
        "image_id", "w", "h", "fmt", "phash",
        F.round("mean_luma", 4).alias("mean_luma"),
    )


def _multimodal_oracle_sql() -> str:
    """Literal-table oracle for multimodal_features: the pure-Python twin
    of the decode/feature path (same codecs, same batched-DCT phash)."""
    from .operators.multimodal import decode_image
    from .synth.phash import gray32, phash64_batch
    from .synth.worldgen import make_image_bytes

    vals = []
    for i in range(256):
        image_id = f"img-q-{i:05d}"
        fmt = "jpg" if i % 3 == 0 else "png"
        px = decode_image(make_image_bytes(13, image_id, (32,), fmt=fmt), fmt)
        g = gray32(px)
        ph = int(phash64_batch(g[None])[0])
        vals.append(
            f"('{image_id}', {px.shape[1]}, {px.shape[0]}, '{fmt}', "
            f"CAST({ph} AS BIGINT), round(CAST({float(g.mean()):.17g} AS DOUBLE), 4))"
        )
    return (
        "SELECT * FROM (VALUES " + ", ".join(vals)
        + ") AS t(image_id, w, h, fmt, phash, mean_luma)"
    )


def category_top1_q(spark: SparkSession, sf: str) -> DataFrame:
    """E7 top-1 category assignment: label-centroid vectors as the
    category matrix, argmax per embedding row (threshold dropped to keep
    rows at every sf). SQL-twinned: centroids, dot products, argmax and
    the tie-break are all expressible; components are rounded at 6/4dp so
    partial-agg summation-order drift (~1e-15) cannot flip a value."""
    emb = load(spark, sf, "embeddings")
    cats = (
        emb.groupBy("label")
        .agg(F.array(*[
            F.round(F.avg(F.col("embedding")[i]), 6) for i in range(S.EMBED_DIM)
        ]).alias("embedding"))
        .select(F.col("label").cast("int").alias("category_id"), "embedding")
    )
    prods = emb.select(F.concat(F.lit("v-"), F.col("vec_id")).alias("url"), "embedding")
    return S.category_top1_assignment(prods, cats, threshold=0.0)


SQL_CATEGORY_TOP1 = """
WITH cent AS (
  SELECT CAST(label AS INTEGER) AS category_id, i,
         round(AVG(CAST(embedding[i] AS DOUBLE)), 6) AS c
  FROM embeddings, UNNEST(generate_series(1, 64)) AS t(i)
  GROUP BY 1, 2
), scored AS (
  SELECT 'v-' || CAST(e.vec_id AS VARCHAR) AS url, cent.category_id,
         round(SUM(CAST(e.embedding[cent.i] AS DOUBLE) * cent.c), 4) AS sim
  FROM embeddings e CROSS JOIN cent
  GROUP BY 1, 2
)
SELECT url, category_id, sim FROM (
  SELECT url, category_id, sim,
         row_number() OVER (PARTITION BY url
                            ORDER BY sim DESC, category_id ASC) AS rn
  FROM scored)
WHERE rn = 1 AND sim >= 0.0
"""


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    # headline scan/join/agg shapes
    "q1_pricing_summary": q1_pricing_summary,
    "q3_top_revenue": q3_top_revenue,
    "q5_nation_revenue": q5_nation_revenue,
    "events_sessionize": events_sessionize,
    "rollup_revenue": rollup_revenue,
    "exact_percentile": exact_percentile,
    "corr_subquery_acctbal": corr_subquery_acctbal,
    "ntile_decile": ntile_decile,
    "distinct_parts": distinct_parts,
    # crawl-operator parity (SURVEY.md §2)
    "first_wins_dedup": first_wins_dedup,
    "pagination_expand": pagination_expand,
    "anti_join_new": anti_join_new,
    "topk_per_group": topk_per_group,
    "threshold_filter": threshold_filter,
    "upsert_merge": upsert_merge,
    "count_stats": count_stats,
    "manual_guard_update": manual_guard_update,
    "cascade_delete": cascade_delete,
    "breadcrumb_join": breadcrumb_join,
    "price_cleanup": price_cleanup,
    "amount_units_parse": amount_units_parse,
    "variant_explode": variant_explode,
    "run_state_guard": run_state_guard,
    "prompt_template": prompt_template,
    "replace_children": replace_children_q,
    "clear_categories": clear_categories_q,
    "assoc_replace": assoc_replace,
    "append_commit": append_commit_counts,
    "validation_split": validation_split,
    # training-data pipeline
    "dedup_exact": dedup_exact,
    "dedup_minhash_lsh": dedup_minhash_lsh,
    "dedup_simhash": dedup_simhash,
    "simhash_near_pairs": simhash_near_pairs,
    "ngram_jaccard": ngram_jaccard,
    "embedding_neardup": embedding_neardup,
    "ann_topk_cosine": ann_topk_cosine,
    "text_lang_id": text_lang_id,
    "text_quality": text_quality,
    "text_token_count": text_token_count,
    "doc_fingerprint": doc_fingerprint,
    # UDF-backed scale paths (rows-only check)
    "ann_lsh_topk": ann_lsh_topk_q,
    "ann_ivf_topk": ann_ivf_topk_q,
    "embed_fill": embed_fill_q,
    "category_top1": category_top1_q,
    "multimodal_features": multimodal_features_q,
}

ORACLE: dict[str, str] = {
    "q1_pricing_summary": SQL_Q1,
    "q3_top_revenue": SQL_Q3,
    "q5_nation_revenue": SQL_Q5,
    "events_sessionize": SQL_SESSIONIZE,
    "rollup_revenue": SQL_ROLLUP,
    "exact_percentile": SQL_PERCENTILE,
    "corr_subquery_acctbal": SQL_CORR_SUBQUERY,
    "ntile_decile": SQL_NTILE,
    "distinct_parts": SQL_DISTINCT_PARTS,
    "first_wins_dedup": SQL_FIRST_WINS,
    "pagination_expand": SQL_PAGINATION,
    "anti_join_new": SQL_ANTI_JOIN,
    "topk_per_group": SQL_TOPK_GROUP,
    "threshold_filter": SQL_THRESHOLD,
    "upsert_merge": SQL_UPSERT,
    "count_stats": SQL_COUNT_STATS,
    "manual_guard_update": SQL_MANUAL_GUARD,
    "cascade_delete": SQL_CASCADE_DELETE,
    "breadcrumb_join": SQL_BREADCRUMB,
    "price_cleanup": SQL_PRICE_CLEANUP,
    "amount_units_parse": SQL_AMOUNT_UNITS,
    "variant_explode": SQL_VARIANT,
    "run_state_guard": SQL_RUN_STATE,
    "prompt_template": SQL_PROMPT,
    "replace_children": SQL_REPLACE_CHILDREN,
    "clear_categories": SQL_CLEAR_CATEGORIES,
    "assoc_replace": SQL_ASSOC_REPLACE,
    "append_commit": SQL_APPEND_COMMIT,
    "validation_split": SQL_VALIDATION_SPLIT,
    "embed_fill": SQL_EMBED_FILL,
    "category_top1": SQL_CATEGORY_TOP1,
    "ann_lsh_topk": _ann_lsh_sql(),
    "ann_ivf_topk": SQL_ANN_TOPK,
    "dedup_exact": D.exact_dedup_sql(),
    "dedup_minhash_lsh": D.lsh_candidate_pairs_sql(),
    "dedup_simhash": D.simhash_sql(),
    "simhash_near_pairs": D.simhash_near_pairs_sql(),
    "ngram_jaccard": D.ngram_jaccard_pairs_sql(threshold=0.2),
    "embedding_neardup": D.embedding_neardup_pairs_sql(threshold=0.2),
    "ann_topk_cosine": SQL_ANN_TOPK,
    "text_lang_id": SQL_LANG_ID,
    "text_quality": SQL_QUALITY,
    "text_token_count": SQL_TOKEN_COUNT,
    "doc_fingerprint": SQL_FINGERPRINT,
}

# Oracles that are expensive to synthesize (literal tables precomputed by
# pure-Python twins) are built on demand; full_oracle() returns the
# complete driver-gate mapping.
_LAZY_ORACLE: dict[str, Callable[[], str]] = {
    "multimodal_features": _multimodal_oracle_sql,
}


def full_oracle() -> dict[str, str]:
    out = dict(ORACLE)
    for name, build in _LAZY_ORACLE.items():
        out[name] = build()
    return out


def benchmark_association_q(spark: SparkSession, sf: str) -> DataFrame:
    """E6 benchmark association shape over documents: hash-embed every
    doc (E3), broadcast doc-0's vector as the benchmark (E4), top-10 per
    source with the threshold filter (E5/E6). The SQL twin recomputes the
    embedder in bucket-sparse form and the dot products via a bucket
    join — the full association pipeline is value-checked."""
    d = load(spark, sf, "documents").select(
        "doc_id", "source", F.col("text").alias("prompt"),
        F.lit(None).cast("array<float>").alias("embedding"),
    )
    filled = S.fill_missing_embeddings(d)
    qrow = filled.filter(F.col("doc_id") == 0).select("embedding").first()
    prods = filled.filter(F.col("doc_id") != 0).select(
        F.col("source").alias("crawler_id"),
        F.col("doc_id").alias("url"),
        "embedding",
    )
    out = S.benchmark_topk_association(
        prods, [float(x) for x in qrow[0]], k=10, threshold=0.0
    )
    return out.select(
        F.col("crawler_id").alias("source"), F.col("url").alias("doc_id"),
        "sim", "rank",
    )


SQL_BENCH_ASSOC = f"""
WITH toks AS (
  SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x != '')) AS tok
  FROM documents
), tb AS (
  SELECT doc_id, CAST({_MD5_LE64} AS UBIGINT) AS dg FROM toks
), sb AS (
  SELECT doc_id, CAST(dg % 64 AS INTEGER) AS bucket,
         SUM(CASE WHEN (dg >> 32) & 1 = 1 THEN 1.0 ELSE -1.0 END) AS s
  FROM tb GROUP BY doc_id, bucket
), nrm AS (
  SELECT doc_id, sqrt(SUM(s * s)) AS nn FROM sb GROUP BY doc_id
), comps AS (
  SELECT sb.doc_id, sb.bucket,
         CAST(CASE WHEN nrm.nn > 0 THEN sb.s / nrm.nn ELSE 0.0 END AS REAL) AS comp
  FROM sb JOIN nrm ON sb.doc_id = nrm.doc_id
), qc AS (
  SELECT bucket, comp FROM comps WHERE doc_id = 0
), dots AS (
  SELECT c.doc_id,
         round(SUM(CAST(c.comp AS DOUBLE) * CAST(q.comp AS DOUBLE)), 4) AS sim
  FROM comps c JOIN qc q ON c.bucket = q.bucket
  WHERE c.doc_id != 0
  GROUP BY c.doc_id
), scored AS (
  SELECT d.source, d.doc_id, COALESCE(t.sim, 0.0) AS sim
  FROM documents d LEFT JOIN dots t ON t.doc_id = d.doc_id
  WHERE d.doc_id != 0
)
SELECT source, doc_id, sim, rank FROM (
  SELECT source, doc_id, sim,
         row_number() OVER (PARTITION BY source
                            ORDER BY sim DESC, doc_id ASC) AS rank
  FROM scored)
WHERE rank <= 10 AND sim >= 0.0
"""

QUERIES["benchmark_association"] = benchmark_association_q
ORACLE["benchmark_association"] = SQL_BENCH_ASSOC


def entity_decode(spark: SparkSession, sf: str) -> DataFrame:
    """S6 HTML entity decode before JSON parse (rusteaco.rs:275):
    escaped payloads synthesized from part names, decoded by the engine's
    JVM replace chain; the oracle runs the identical nested replace()."""
    from .functions.parsing import unescape_entities_col

    p = load(spark, sf, "part")
    esc = F.concat(
        F.lit("&quot;"), F.col("p_name"),
        F.lit("&quot; &amp; &lt;b&gt;tea&lt;/b&gt; &#39;x&#39;"),
    )
    return p.select("p_partkey", unescape_entities_col(esc).alias("decoded"))


def _entity_decode_sql() -> str:
    from .functions.parsing import unescape_entities_sql

    esc = ("'&quot;' || p_name || "
           "'&quot; &amp; &lt;b&gt;tea&lt;/b&gt; &#39;x&#39;'")
    return f"SELECT p_partkey, {unescape_entities_sql(esc)} AS decoded FROM part"


QUERIES["entity_decode"] = entity_decode
ORACLE["entity_decode"] = _entity_decode_sql()


def _pcm16_bytes(i: int) -> bytes:
    """Deterministic PCM16 payload: a seeded sine at 220+10*i Hz."""
    import numpy as np

    n = 1600 + 37 * i
    t = np.arange(n, dtype=np.float64)
    wave = np.sin(2.0 * np.pi * (220.0 + 10.0 * i) * t / 16_000.0) * 9000.0
    return wave.astype("<i2").tobytes()


def audio_features_q(spark: SparkSession, sf: str) -> DataFrame:
    """Audio multimodal path: duration + RMS over raw PCM16 binary
    payloads via the production mapInPandas operator; the oracle is a
    literal table precomputed by the identical numpy math."""
    import pandas as pd

    from .operators.multimodal import AUDIO_FEATURES, audio_features_fn

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].tolist()
            yield pd.DataFrame({
                "audio_id": [f"au-{i:04d}" for i in ids],
                "bytes": [_pcm16_bytes(int(i)) for i in ids],
            })

    au = spark.range(64).repartition(4).mapInPandas(
        gen, "audio_id string, bytes binary"
    )
    # no rounding: both sides run the IDENTICAL numpy math, so the doubles
    # are bit-equal; rounding would only ADD divergence (durations are
    # exact multiples of 1/16000, which sit on .5 decimal boundaries where
    # Spark's BigDecimal HALF_UP and Python's binary round disagree)
    return au.mapInPandas(audio_features_fn(), AUDIO_FEATURES).select(
        "audio_id", "duration_s", "rms"
    )


def _audio_oracle_sql() -> str:
    import numpy as np

    vals = []
    for i in range(64):
        pcm = np.frombuffer(_pcm16_bytes(i), dtype="<i2").astype(np.float64)
        dur = len(pcm) / 16_000.0
        rms = float(np.sqrt((pcm ** 2).mean())) if len(pcm) else 0.0
        vals.append(
            f"('au-{i:04d}', CAST({dur!r} AS DOUBLE), CAST({rms!r} AS DOUBLE))"
        )
    return ("SELECT * FROM (VALUES " + ", ".join(vals)
            + ") AS t(audio_id, duration_s, rms)")


QUERIES["audio_features"] = audio_features_q
_LAZY_ORACLE["audio_features"] = _audio_oracle_sql


def dedup_clusters_q(spark: SparkSession, sf: str) -> DataFrame:
    """Dedup-group assignment: LSH candidates -> exact-Jaccard confirm ->
    distributed connected components (iterative min-label propagation) ->
    one representative per cluster. The oracle computes the same
    components with a recursive CTE (transitive closure + min)."""
    return D.dedup_clusters(load(spark, sf, "documents"), threshold=0.2)


QUERIES["dedup_clusters"] = dedup_clusters_q
ORACLE["dedup_clusters"] = D.dedup_clusters_sql(threshold=0.2)


def cube_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """CUBE aggregation (all grouping-set combinations + totals)."""
    li = load(spark, sf, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
        F.count("*").alias("n_rows"),
    )


SQL_CUBE = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_rows
FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
"""


def running_total(spark: SparkSession, sf: str) -> DataFrame:
    """Running window sum per customer over a deterministic order."""
    o = load(spark, sf, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey", "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_spend"),
    )


SQL_RUNNING_TOTAL = """
SELECT o_custkey, o_orderkey,
       round(sum(o_totalprice) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend
FROM orders
"""


def exists_semijoin(spark: SparkSession, sf: str) -> DataFrame:
    """EXISTS shape: suppliers that shipped any high-value line (left_semi
    — the probe side never widens the output)."""
    s = load(spark, sf, "supplier")
    li = load(spark, sf, "lineitem").filter(F.col("l_extendedprice") > 50000)
    return s.join(li, s.s_suppkey == li.l_suppkey, "left_semi").select(
        "s_suppkey", "s_name"
    )


SQL_EXISTS = """
SELECT s_suppkey, s_name FROM supplier s
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_suppkey = s.s_suppkey AND l_extendedprice > 50000)
"""

QUERIES["cube_revenue"] = cube_revenue
ORACLE["cube_revenue"] = SQL_CUBE
QUERIES["running_total"] = running_total
ORACLE["running_total"] = SQL_RUNNING_TOTAL
QUERIES["exists_semijoin"] = exists_semijoin
ORACLE["exists_semijoin"] = SQL_EXISTS


# ---------------------------------------------------------------- video

def _video_frame_px(i: int, f: int):
    """Deterministic 8x8 RGB frame pixels for video i, frame f."""
    import numpy as np

    x = np.arange(8, dtype=np.uint64)
    base = (np.add.outer(x * 7, x * 13) + i * 31 + f * 17) % 256
    return np.stack([base, (base * 3) % 256, (base * 5) % 256], axis=-1).astype(np.uint8)


def _video_bytes(i: int) -> bytes:
    """Deterministic VMJ1 payload: 8 + (i%5) PNG frames."""
    from .synth.png import encode_png
    from .synth.video import encode_video

    n = 8 + (i % 5)
    return encode_video([encode_png(_video_frame_px(i, f)) for f in range(n)], fps=10)


def video_frames_q(spark: SparkSession, sf: str) -> DataFrame:
    """Video multimodal path: demux the VMJ1 container, sample every 4th
    frame, and run the sampled frames through the image-feature operator
    (the composition a 100 TB video pipeline performs per clip). Output
    is exact-integer (w, h, phash), so the oracle is a literal table
    computed by the identical pure-Python demux+phash twin."""
    import pandas as pd

    from .operators.multimodal import (VIDEO_FRAMES, extract_image_features,
                                       video_frame_sample_fn)

    def gen(batches):
        for pdf in batches:
            yield pd.DataFrame({
                "video_id": [f"vid-{int(i):04d}" for i in pdf["id"]],
                "bytes": [_video_bytes(int(i)) for i in pdf["id"]],
            })

    vids = spark.range(16).repartition(4).mapInPandas(
        gen, "video_id string, bytes binary"
    )
    frames = vids.mapInPandas(video_frame_sample_fn(every_n=4), VIDEO_FRAMES)
    stills = frames.select(
        F.concat_ws("#", "video_id", F.col("frame_no").cast("string")).alias("image_id"),
        F.col("frame_png").alias("bytes"),
        F.lit("png").alias("fmt"),
    )
    return extract_image_features(stills).select("image_id", "w", "h", "phash")


def _video_oracle_sql() -> str:
    from .synth.phash import gray32, phash64_batch

    vals = []
    for i in range(16):
        n = 8 + (i % 5)
        for f in range(0, n, 4):
            g = gray32(_video_frame_px(i, f))
            ph = int(phash64_batch(g[None])[0])
            vals.append(f"('vid-{i:04d}#{f}', 8, 8, CAST({ph} AS BIGINT))")
    return ("SELECT * FROM (VALUES " + ", ".join(vals)
            + ") AS t(image_id, w, h, phash)")


QUERIES["video_frames"] = video_frames_q
_LAZY_ORACLE["video_frames"] = _video_oracle_sql


# ------------------------------------------------- image phash near-dup

def _neardup_image_px(i: int, variant: str):
    """Deterministic image pixels: variant 'a' = base; 'b' = near-dup of
    base for even i (tiny luma perturbation), unrelated image for odd i."""
    import numpy as np

    from .synth.worldgen import make_image_pixels

    if variant == "a":
        return make_image_pixels(11, f"nd-{i}", (32,))
    if i % 2 == 0:
        px = make_image_pixels(11, f"nd-{i}", (32,)).astype(np.int32)
        px[:4, :4] += 2  # imperceptible edit -> small phash Hamming drift
        return np.clip(px, 0, 255).astype(np.uint8)
    return make_image_pixels(11, f"nd-{i}-other", (32,))


def _neardup_image_bytes(i: int, variant: str) -> bytes:
    """'a' encodes PNG (lossless); 'b' encodes LJQ1 lossy — so the pair
    detection also spans the codec boundary (PSNR>=40dB keeps phash
    drift inside the band-join's Hamming budget)."""
    from .synth.lossy import encode_lossy
    from .synth.png import encode_png

    px = _neardup_image_px(i, variant)
    return encode_png(px) if variant == "a" else encode_lossy(px)


def image_phash_neardup_q(spark: SparkSession, sf: str) -> DataFrame:
    """Image near-duplicate detection — the core image-dedup operator of
    a crawl pipeline: decode + phash via the production mapInPandas
    operator, then pigeonhole band join on the 64-bit phash (never
    all-pairs). Even-numbered pairs are near-dups across the PNG/lossy
    codec boundary; odd-numbered pairs are unrelated."""
    import pandas as pd

    from .operators.multimodal import extract_image_features

    def gen(batches):
        for pdf in batches:
            ids, blobs, fmts = [], [], []
            for i in pdf["id"]:
                i = int(i)
                for v, fmt in (("a", "png"), ("b", "jpg")):
                    ids.append(f"nd-{i:03d}-{v}")
                    blobs.append(_neardup_image_bytes(i, v))
                    fmts.append(fmt)
            yield pd.DataFrame({"image_id": ids, "bytes": blobs, "fmt": fmts})

    imgs = spark.range(24).repartition(4).mapInPandas(
        gen, "image_id string, bytes binary, fmt string"
    )
    feats = extract_image_features(imgs).select("image_id", "phash")
    return D.signature_near_pairs(
        feats, sig_col="phash", id_col="image_id", n_bits=64, max_hamming=6
    ).select(
        F.col("id_a").alias("image_a"), F.col("id_b").alias("image_b"), "hamming"
    )


def _image_phash_neardup_oracle_sql() -> str:
    from .operators.multimodal import decode_image
    from .synth.phash import gray32, phash64_batch

    vals = []
    for i in range(24):
        for v, fmt in (("a", "png"), ("b", "jpg")):
            px = decode_image(_neardup_image_bytes(i, v), fmt)
            ph = int(phash64_batch(gray32(px)[None])[0])
            vals.append(f"('nd-{i:03d}-{v}', CAST({ph} AS BIGINT))")
    inner = ("SELECT * FROM (VALUES " + ", ".join(vals)
             + ") AS t(image_id, phash)")
    sql = D.signature_near_pairs_sql(
        inner, sig_col="phash", id_col="image_id", n_bits=64, max_hamming=6
    )
    return (f"SELECT id_a AS image_a, id_b AS image_b, hamming FROM ({sql}) q")


QUERIES["image_phash_neardup"] = image_phash_neardup_q
_LAZY_ORACLE["image_phash_neardup"] = _image_phash_neardup_oracle_sql


# ------------------------------------------------ more analytic surface

def lead_lag_gap(spark: SparkSession, sf: str) -> DataFrame:
    """LEAD/LAG window functions: per-user inter-event gap in whole
    seconds and the next event's type — the feed for sessionization and
    funnel analysis. Whole-second epoch arithmetic (the same portable
    trick events_sessionize uses) sidesteps NTZ-fractional divergence
    between engines; the tz offset of the NTZ→timestamp cast cancels in
    the difference."""
    ev = load(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sec = F.col("ts").cast("timestamp").cast("long")
    return ev.select(
        "event_id", "user_id",
        (sec - F.lag(sec).over(w)).alias("gap_s"),
        F.lead("event_type").over(w).alias("next_type"),
    )


SQL_LEAD_LAG = """
SELECT event_id, user_id,
       CAST(floor(epoch(ts)) AS BIGINT)
         - lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER w AS gap_s,
       lead(event_type) OVER w AS next_type
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


def pivot_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """PIVOT: revenue by order-year x order-priority (fixed column set, so
    the plan is one partial-aggregable groupBy — no dynamic-pivot
    discovery pass). The oracle is the portable CASE-aggregation twin."""
    o = load(spark, sf, "orders")
    pr = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    aggs = [
        F.round(F.sum(F.when(F.col("o_orderpriority") == p,
                             F.col("o_totalprice")).otherwise(F.lit(0.0))), 2)
        .alias(f"rev_{i + 1}")
        for i, p in enumerate(pr)
    ]
    return (
        o.groupBy(F.year("o_orderdate").alias("order_year")).agg(*aggs)
    )


SQL_PIVOT = """
SELECT CAST(year(o_orderdate) AS INT) AS order_year,
       round(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice ELSE 0 END), 2) AS rev_1,
       round(SUM(CASE WHEN o_orderpriority = '2-HIGH' THEN o_totalprice ELSE 0 END), 2) AS rev_2,
       round(SUM(CASE WHEN o_orderpriority = '3-MEDIUM' THEN o_totalprice ELSE 0 END), 2) AS rev_3,
       round(SUM(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN o_totalprice ELSE 0 END), 2) AS rev_4,
       round(SUM(CASE WHEN o_orderpriority = '5-LOW' THEN o_totalprice ELSE 0 END), 2) AS rev_5
FROM orders GROUP BY 1
"""


def percent_rank_price(spark: SparkSession, sf: str) -> DataFrame:
    """PERCENT_RANK + CUME_DIST over part retail prices within brand."""
    p = load(spark, sf, "part")
    w = Window.partitionBy("p_brand").orderBy("p_retailprice", "p_partkey")
    return p.select(
        "p_partkey", "p_brand",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


SQL_PERCENT_RANK = """
SELECT p_partkey, p_brand,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist() OVER w, 6) AS cume
FROM part
WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice, p_partkey)
"""


QUERIES["lead_lag_gap"] = lead_lag_gap
ORACLE["lead_lag_gap"] = SQL_LEAD_LAG
QUERIES["pivot_revenue"] = pivot_revenue
ORACLE["pivot_revenue"] = SQL_PIVOT
QUERIES["percent_rank_price"] = percent_rank_price
ORACLE["percent_rank_price"] = SQL_PERCENT_RANK


# ------------------------------------------- composed curation pipeline

def corpus_curation(spark: SparkSession, sf: str) -> DataFrame:
    """The flagship training-data curation pipeline, composed end-to-end
    from the engine's own operators: quality/length filter (JVM column
    exprs) -> MinHash-LSH candidates -> exact-Jaccard confirm ->
    connected-components dedup clusters -> keep one representative per
    cluster, output with its size and quality features. This is the
    SHAPE of a 100 TB corpus-curation job: every stage is the
    already-plan-audited operator, chained."""
    docs = load(spark, sf, "documents")
    filt = docs.filter(
        (X.token_count_col(F.col("text")) >= 8)
        & (X.quality_score_col(F.col("text")) >= 0.3)
    ).select("doc_id", "text")
    clusters = D.dedup_clusters(filt, threshold=0.2)
    feats = filt.select(
        "doc_id",
        X.token_count_col(F.col("text")).cast("long").alias("n_tokens"),
        X.quality_score_col(F.col("text")).alias("quality"),
    )
    return (
        clusters.filter(F.col("is_rep"))
        .join(feats, "doc_id")
        .select("doc_id", "cluster_size", "n_tokens", "quality")
    )


def _corpus_curation_sql() -> str:
    filt = (f"(SELECT doc_id, text FROM documents "
            f"WHERE {X.token_count_sql('text')} >= 8 "
            f"AND {X.quality_score_sql('text')} >= 0.3) filt")
    cl = D.dedup_clusters_sql(table=filt, threshold=0.2)
    return f"""
    WITH cl AS ({cl}), feats AS (
      SELECT doc_id, CAST({X.token_count_sql('text')} AS BIGINT) AS n_tokens,
             {X.quality_score_sql('text')} AS quality
      FROM documents
      WHERE {X.token_count_sql('text')} >= 8
        AND {X.quality_score_sql('text')} >= 0.3
    )
    SELECT c.doc_id, c.cluster_size, f.n_tokens, f.quality
    FROM cl c JOIN feats f ON f.doc_id = c.doc_id
    WHERE c.is_rep
    """


QUERIES["corpus_curation"] = corpus_curation
_LAZY_ORACLE["corpus_curation"] = _corpus_curation_sql


# --------------------------------------- temporal joins (asof / range)

def asof_join_attribution(spark: SparkSession, sf: str) -> DataFrame:
    """As-of join: each purchase attributed to the user's latest click
    at-or-before it (classic event attribution). Spark has no ASOF JOIN
    builtin — operators/temporal.py re-expresses it as union + one
    window pass over the join key: ONE shuffle, no non-equi nested
    loop. Tie-break pinned to (ts DESC, event_id DESC)."""
    from .operators.temporal import asof_join

    ev = load(spark, sf, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    out = asof_join(purchases, clicks, key="user_id", time_col="ts",
                    right_cols=["event_id"])
    return out.select(
        "event_id", "user_id",
        F.col("ts").cast("timestamp").cast("long").alias("ts_s"),
        F.round("value", 4).alias("value"),
        F.col("event_id_asof").alias("click_id"),
    )


SQL_ASOF = """
SELECT l.event_id, l.user_id,
       CAST(floor(epoch(l.ts)) AS BIGINT) AS ts_s,
       round(l.value, 4) AS value, r2.click_id
FROM (SELECT * FROM events WHERE event_type = 'purchase') l
LEFT JOIN LATERAL (
  SELECT r.event_id AS click_id
  FROM events r
  WHERE r.event_type = 'click' AND r.user_id = l.user_id AND r.ts <= l.ts
  ORDER BY r.ts DESC, r.event_id DESC LIMIT 1
) r2 ON TRUE
"""


def range_join_events(spark: SparkSession, sf: str) -> DataFrame:
    """Range (time-window) self-join: ordered pairs of same-user events
    within 30 minutes — burst/funnel detection. Blocked on coarse time
    buckets (operators/temporal.py): the join shuffles on
    (user, bucket), never a per-user nested loop."""
    from .operators.temporal import range_self_join

    ev = load(spark, sf, "events")
    return range_self_join(ev, key="user_id", time_col="ts",
                           id_col="event_id", band_s=1800)


def _range_join_sql() -> str:
    from .operators.temporal import range_self_join_sql

    return range_self_join_sql("events", key="user_id", time_col="ts",
                               id_col="event_id", band_s=1800)


QUERIES["asof_join_attribution"] = asof_join_attribution
ORACLE["asof_join_attribution"] = SQL_ASOF
QUERIES["range_join_events"] = range_join_events
_LAZY_ORACLE["range_join_events"] = _range_join_sql


# ------------------------- deterministic sampling + tf-idf top terms

def sample_by_hash(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic hash-mod sampling — the training-data staple for
    reproducible splits/shards: md5-hash the key, keep buckets 0-2 of
    10. Pure JVM exprs; the SAME rows come out at any parallelism, any
    engine (the md5long twin is bit-identical on DuckDB)."""
    docs = load(spark, sf, "documents")
    bucket = F.pmod(X.md5long(F.col("doc_id").cast("string")), F.lit(10))
    return (
        docs.withColumn("bucket", bucket.cast("int"))
        .filter(F.col("bucket") < 3)
        .select("doc_id", "lang", "n_chars", "bucket")
    )


def _sample_by_hash_sql() -> str:
    h = X.md5long_sql("CAST(doc_id AS VARCHAR)")
    return f"""
    SELECT doc_id, lang, n_chars,
           CAST(({h}) % 10 AS INT) AS bucket
    FROM documents
    WHERE ({h}) % 10 < 3
    """


def tfidf_top_terms(spark: SparkSession, sf: str) -> DataFrame:
    """Top-3 terms per document by tf-idf (linear idf N/df, not log —
    ln() differs in the last ulp across engines and would make ranking
    nondeterministic; the linear variant is exact IEEE division on both).
    Scores are rounded to 4dp BEFORE ranking so both engines rank
    identical values; ties break on the term string."""
    from .caching import carry, scoped_persist

    docs = load(spark, sf, "documents")
    n_docs = docs.count()  # O(1) driver scalar, footer-countable at scale
    toks = D.spread_narrow_scan(docs, "doc_id").select(
        "doc_id", F.explode(X.tokens_col(F.col("text"))).alias("tok")
    )
    # tf feeds both the score and the document frequency: (doc_id, tok)
    # is unique after the aggregation, so df = tf.groupBy(tok).count() —
    # the r05 plan re-exploded the corpus and paid a distinct exchange
    # for df (guide §2.4: two ops keyed the same way share one pass)
    tf = scoped_persist(toks.groupBy("doc_id", "tok").agg(F.count("*").alias("tf")))
    df_ = tf.groupBy("tok").agg(F.count("*").alias("df"))
    scored = tf.join(df_, "tok").withColumn(
        "tfidf",
        F.round((F.col("tf") * F.lit(float(n_docs))) / F.col("df"), 4),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("tok"))
    out = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "tok", "tfidf", "rank")
    )
    return carry(out, tf)


SQL_TFIDF = """
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(string_split(text, ' '), x -> x != '')) AS tok
  FROM documents
), tf AS (
  SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
  FROM toks GROUP BY doc_id, tok
), df AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS df
  FROM (SELECT DISTINCT doc_id, tok FROM toks) GROUP BY tok
), scored AS (
  SELECT tf.doc_id, tf.tok,
         round((tf.tf * CAST((SELECT COUNT(*) FROM documents) AS DOUBLE)) / df.df, 4) AS tfidf
  FROM tf JOIN df ON df.tok = tf.tok
)
SELECT doc_id, tok, tfidf, rank FROM (
  SELECT doc_id, tok, tfidf,
         CAST(row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, tok) AS INT) AS rank
  FROM scored
) WHERE rank <= 3
"""


QUERIES["sample_by_hash"] = sample_by_hash
_LAZY_ORACLE["sample_by_hash"] = _sample_by_hash_sql
QUERIES["tfidf_top_terms"] = tfidf_top_terms
ORACLE["tfidf_top_terms"] = SQL_TFIDF


# --------------------------------- more classic analytic shapes (r03)

def q10_returned_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returned items per customer —
    fact joins narrowed by the return flag, broadcast nation dim, top-20
    by rounded revenue with a key tie-break (the q3 determinism
    pattern)."""
    c = load(spark, sf, "customer")
    o = load(spark, sf, "orders")
    li = load(spark, sf, "lineitem").filter(F.col("l_returnflag") == "R")
    n = F.broadcast(load(spark, sf, "nation"))
    rev = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
             .alias("revenue"))
    )
    return rev.orderBy(F.desc("revenue"), F.asc("c_custkey")).limit(20)


SQL_Q10 = """
SELECT c_custkey, c_name, n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


def q18_large_orders(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING over a big aggregation (orders whose total
    quantity exceeds a threshold), then the customer join — the
    aggregate prunes before the join. Quantities are whole numbers, so
    double summation is exact in any order (no rounding hazard)."""
    li = load(spark, sf, "lineitem")
    o = load(spark, sf, "orders")
    c = load(spark, sf, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .filter(F.col("total_qty") > 250.0)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select("c_custkey", "c_name", "l_orderkey",
                F.round("o_totalprice", 2).alias("o_totalprice"), "total_qty")
    )


SQL_Q18 = """
SELECT c_custkey, c_name, l_orderkey,
       round(o_totalprice, 2) AS o_totalprice, total_qty
FROM (
  SELECT l_orderkey, round(sum(l_quantity), 2) AS total_qty
  FROM lineitem GROUP BY l_orderkey HAVING round(sum(l_quantity), 2) > 250.0
)
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
"""


def customers_without_urgent_orders(spark: SparkSession, sf: str) -> DataFrame:
    """NOT EXISTS anti-join: customers with no '1-URGENT' order — the
    complement of exists_semijoin; pure key comparison, no floats.
    (Unlike "no orders at all", this set is non-empty at every SF.)"""
    c = load(spark, sf, "customer")
    o = load(spark, sf, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        c.join(o.select(F.col("o_custkey").alias("c_custkey")).distinct(),
               "c_custkey", "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


SQL_NO_URGENT = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
)
"""


QUERIES["q10_returned_revenue"] = q10_returned_revenue
ORACLE["q10_returned_revenue"] = SQL_Q10
QUERIES["q18_large_orders"] = q18_large_orders
ORACLE["q18_large_orders"] = SQL_Q18
QUERIES["customers_without_urgent_orders"] = customers_without_urgent_orders
ORACLE["customers_without_urgent_orders"] = SQL_NO_URGENT


# --------------------------------- round-4 classic analytic shapes

def grouping_sets_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """GROUPING SETS — the general form behind ROLLUP/CUBE (both already
    gated): explicit (flag,status) / (flag) / () granularities in ONE
    aggregation pass. Spark expands the sets map-side and keeps the
    aggregation partial, so at 100 TB this is still one shuffle keyed by
    (grouping-id, keys). GROUPING() markers disambiguate real NULLs from
    subtotal rows, cast to int on both engines."""
    li = load(spark, sf, "lineitem")
    li.createOrReplaceTempView("li_gsets")
    return spark.sql("""
        SELECT l_returnflag, l_linestatus,
               CAST(grouping(l_returnflag) AS INT) AS g_flag,
               CAST(grouping(l_linestatus) AS INT) AS g_status,
               round(sum(l_quantity), 2) AS sum_qty,
               count(*) AS n_rows
        FROM li_gsets
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                (l_returnflag), ())
    """)


SQL_GROUPING_SETS = """
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
       CAST(GROUPING(l_linestatus) AS INT) AS g_status,
       round(sum(l_quantity), 2) AS sum_qty,
       CAST(count(*) AS BIGINT) AS n_rows
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
"""


def q2_min_cost_supplier(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q2 shape adapted to this schema (no partsupp table): for
    each size-25 part, the supplier with the LOWEST average sale price
    in lineitem, ties broken by smallest suppkey. Plan shape: broadcast
    the filtered part dim into the fact scan, one partial-agg shuffle on
    (partkey, suppkey), then a window min per part — never a correlated
    per-part subquery. Reference analog: the benchmark job's best-price
    association (src/processing/benchmark.rs) is this same
    argmin-per-group pattern."""
    li = load(spark, sf, "lineitem")
    p = F.broadcast(load(spark, sf, "part").filter(F.col("p_size") == 25))
    s = F.broadcast(load(spark, sf, "supplier"))
    avg_price = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_partkey", "p_name", "l_suppkey")
        .agg(F.round(F.avg("l_extendedprice"), 2).alias("avg_price"))
    )
    w = Window.partitionBy("p_partkey").orderBy(
        F.asc("avg_price"), F.asc("l_suppkey")
    )
    return (
        avg_price.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .select("p_partkey", "p_name",
                F.col("l_suppkey").alias("s_suppkey"), "s_name", "avg_price")
    )


SQL_Q2_MIN_COST = """
WITH avg_price AS (
  SELECT p_partkey, p_name, l_suppkey,
         round(avg(l_extendedprice), 2) AS avg_price
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_size = 25
  GROUP BY p_partkey, p_name, l_suppkey
), best AS (
  SELECT p_partkey, p_name, l_suppkey, avg_price,
         row_number() OVER (PARTITION BY p_partkey
                            ORDER BY avg_price ASC, l_suppkey ASC) AS rn
  FROM avg_price
)
SELECT p_partkey, p_name, l_suppkey AS s_suppkey, s_name, avg_price
FROM best JOIN supplier ON l_suppkey = s_suppkey
WHERE rn = 1
"""


def q4_late_shipments(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q4 shape adapted to this schema (no commit/receipt dates):
    per order priority, how many orders have at least one line shipped
    more than 60 days after the order date. The EXISTS becomes a
    semi-join whose inequality predicate references both sides, so it
    stays attached to the key join (one shuffle on orderkey), then a
    broadcast-sized count per priority."""
    o = load(spark, sf, "orders")
    li = load(spark, sf, "lineitem").select("l_orderkey", "l_shipdate")
    late = (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > F.date_add(o.o_orderdate, 60)),
            "left_semi",
        )
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
    )


SQL_Q4_LATE = """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey
    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
)
GROUP BY o_orderpriority
"""


QUERIES["grouping_sets_revenue"] = grouping_sets_revenue
ORACLE["grouping_sets_revenue"] = SQL_GROUPING_SETS
QUERIES["q2_min_cost_supplier"] = q2_min_cost_supplier
ORACLE["q2_min_cost_supplier"] = SQL_Q2_MIN_COST
QUERIES["q4_late_shipments"] = q4_late_shipments
ORACLE["q4_late_shipments"] = SQL_Q4_LATE
