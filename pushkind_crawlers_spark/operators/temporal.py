"""Temporal join operators Spark lacks as builtins: as-of join and
range (time-window) join, built scale-first.

The graft brief names these explicitly as operators to re-express with
DataFrame compositions when semantics allow — both do:

* ``asof_join`` — the classic union+window recipe: tag both sides, union
  on the join key, one window pass ordered by (time, side) carrying the
  last-seen right row forward. ONE shuffle on the key, no per-key loop,
  no non-equi join (a naive ``left.ts >= right.ts`` join plans as
  BroadcastNestedLoopJoin and is quadratic per key).
* ``range_self_join`` — pairs within a time band, blocked on coarse time
  buckets: each row lands in its bucket, candidates equi-join on
  (key, bucket) with each left row probing bucket and bucket+1, exact
  band filter after. The shuffle key is (key, bucket) — never all-pairs
  within a key. This is the same pigeonhole shape as the signature band
  joins in operators/dedup.py.

The reference has no temporal joins (it is a crawler); these serve the
training-data-pipeline surface (event attribution, burst detection).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def asof_join(left: DataFrame, right: DataFrame, key: str, time_col: str,
              right_cols: list[str], suffix: str = "_asof") -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``(time, *right_cols)`` not after the left row's time, per key.

    Tie-break: a right row at exactly the left row's time DOES match
    (<=), and among right rows sharing a timestamp the one with the
    lexicographically largest ``right_cols`` tuple wins (NULL smallest)
    — fully deterministic for ANY number of right columns.

    The right row travels as ONE struct, so every suffixed output column
    comes from the SAME right row — per-column carries could mix values
    from different rows when a winning row holds NULL in a secondary
    column.

    Output: every left column + ``<c><suffix>`` for each right col
    (NULL when no right row precedes). One shuffle on ``key``.
    """
    lcols = left.columns
    rstruct_t = T.StructType(
        [T.StructField(c, right.schema[c].dataType) for c in right_cols]
    )
    tag_r = right.select(
        F.col(key), F.col(time_col),
        F.struct(*[F.col(c) for c in right_cols]).alias("_rrow"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c)
          for c in lcols if c not in (key, time_col)],
    )
    tag_l = left.select(
        F.col(key), F.col(time_col),
        F.lit(None).cast(rstruct_t).alias("_rrow"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in lcols if c not in (key, time_col)],
    )
    unioned = tag_r.unionByName(tag_l)
    # rights sort before lefts at equal time (side 0 < 1) so an
    # exactly-simultaneous right row is visible to the left row; among
    # equal-time rights the LAST carried struct is the lexicographic max
    # of the right_cols tuple (struct ordering is field-wise, NULL first
    # in asc => NULL smallest), so the whole winning row is carried
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(time_col), F.col("_side"),
                 F.col("_rrow").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*", F.last("_rrow", ignorenulls=True).over(w).alias("_match")
    )
    return carried.filter(F.col("_side") == 1).select(
        *lcols,
        *[F.col(f"_match.{c}").alias(f"{c}{suffix}") for c in right_cols],
    )


def asof_join_sql(left_sql: str, right_sql: str, key: str, time_col: str,
                  right_cols: list[str], left_cols: list[str],
                  suffix: str = "_asof") -> str:
    """DuckDB twin via LATERAL with the same explicit tie-break (never
    the native ASOF JOIN — its duplicate-timestamp choice is
    unspecified, ours is pinned). Ordering spans ALL right cols DESC
    NULLS LAST, matching the engine's lexicographic-max-struct carry."""
    order = ", ".join(
        [f"r.{time_col} DESC"]
        + [f"r.{c} DESC NULLS LAST" for c in right_cols]
    )
    rsel = ", ".join(f"r.{c} AS {c}{suffix}" for c in right_cols)
    lsel = ", ".join(f"l.{c}" for c in left_cols)
    return f"""
    SELECT {lsel}, {', '.join(f'r2.{c}{suffix}' for c in right_cols)}
    FROM ({left_sql}) l
    LEFT JOIN LATERAL (
      SELECT {rsel} FROM ({right_sql}) r
      WHERE r.{key} = l.{key} AND r.{time_col} <= l.{time_col}
      ORDER BY {order} LIMIT 1
    ) r2 ON TRUE
    """


def range_self_join(df: DataFrame, key: str, time_col: str, id_col: str,
                    band_s: int = 3600) -> DataFrame:
    """Ordered pairs (a, b) of same-key rows with
    ``0 < ts_b - ts_a <= band_s`` seconds, plus the gap.

    Blocked on coarse time buckets of ``band_s``: a row pairs only with
    rows in its bucket or the next, so each side lands in <=2 buckets
    and the join shuffles on (key, bucket) — bounded work per bucket at
    any scale, never a non-equi nested loop.
    """
    epoch = F.unix_timestamp(F.col(time_col))
    base = df.select(
        F.col(key).alias("_k"), F.col(id_col).alias("_id"),
        # floor, not cast-truncate: truncation rounds toward zero, so
        # pre-1970 (negative-epoch) rows would land one bucket high and
        # boundary-spanning pairs below zero would be missed
        epoch.alias("_ts"), F.floor(epoch / band_s).cast("long").alias("_b"),
    )
    # left probes its own bucket and the next (a pair within band_s
    # spans at most one bucket boundary)
    lhs = base.select(
        "_k", F.col("_id").alias("id_a"), F.col("_ts").alias("ts_a"),
        F.explode(F.array(F.col("_b"), F.col("_b") + 1)).alias("_b"),
    )
    rhs = base.select(
        "_k", F.col("_id").alias("id_b"), F.col("_ts").alias("ts_b"), "_b"
    )
    return (
        lhs.join(rhs, on=["_k", "_b"])
        .filter((F.col("ts_b") > F.col("ts_a"))
                & (F.col("ts_b") - F.col("ts_a") <= band_s))
        .select(
            F.col("_k").alias(key), "id_a", "id_b",
            (F.col("ts_b") - F.col("ts_a")).alias("gap_s"),
        )
        .distinct()  # bucket-and-next probing can see a pair twice
    )


def range_self_join_sql(table: str, key: str, time_col: str, id_col: str,
                        band_s: int = 3600) -> str:
    """Direct non-equi twin (oracle scale only). Epochs are FLOORED to
    whole seconds on both engines (Spark's unix_timestamp truncates;
    DuckDB's CAST would round)."""
    inner = (f"SELECT {key}, {id_col}, "
             f"CAST(floor(epoch({time_col})) AS BIGINT) AS _ts FROM {table}")
    return f"""
    SELECT a.{key} AS {key}, a.{id_col} AS id_a, b.{id_col} AS id_b,
           b._ts - a._ts AS gap_s
    FROM ({inner}) a JOIN ({inner}) b
      ON a.{key} = b.{key}
     AND b._ts > a._ts
     AND b._ts - a._ts <= {band_s}
    """
