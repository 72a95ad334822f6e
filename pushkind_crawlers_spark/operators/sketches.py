"""Mergeable sketches for 100 TB-scale approximate analytics.

The exact-dedup and distinct-count operators elsewhere in this package
are exact by construction; at 10^10+ keys an exact COUNT(DISTINCT) is a
full shuffle of every distinct value. The sketch forms here trade a
bounded relative error for one PARTIAL-AGGREGATABLE pass: each task
builds a fixed-size sketch (KB, independent of cardinality), partials
merge associatively map-side, and only sketch bytes cross the wire —
the same pattern the reference's statistics path would need at scale
(reference anchor: product/image count stats, src/repository/
product.rs:189-204, exact there because sqlite tables are small).

Everything stays JVM-side: Spark 4 ships Apache DataSketches HLL
(`hll_sketch_agg` / `hll_union_agg` / `hll_sketch_estimate`) and a
KLL-backed `approx_percentile`. No Python in the hot path; correctness
is pinned by statistical-bound and merge-associativity tests rather
than a value-exact oracle (the estimates are deterministic for a given
input + lgK, but no ANSI-SQL twin reproduces DataSketches bit-for-bit).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# lgK=14 -> ~16KB sketch, ~0.8% standard error; the default used by the
# engine's stats rollups. Raise to 16-18 only when sub-0.5% error is
# worth 4-16x the shuffle bytes.
DEFAULT_LGK = 14


def hll_distinct(df: DataFrame, group_cols: list[str], value_col: str,
                 lgk: int = DEFAULT_LGK,
                 out_col: str = "approx_distinct") -> DataFrame:
    """Approximate COUNT(DISTINCT value_col) per group: one hash-agg
    shuffle carrying fixed-size sketch partials instead of the distinct
    value set."""
    agg = F.hll_sketch_agg(F.col(value_col), lgk)
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_estimate(agg).alias(out_col)
    )


def hll_sketch_per_group(df: DataFrame, group_cols: list[str],
                         value_col: str, lgk: int = DEFAULT_LGK,
                         out_col: str = "sketch") -> DataFrame:
    """The REUSABLE form: materialize the sketch bytes per group so later
    rollups union sketches instead of rescanning the fact table (e.g.
    per-(host, day) sketches -> per-host totals via hll_union_agg).
    This is the incremental-stats pattern: a day's new partition adds
    one sketch row; historical partitions are never re-read."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(F.col(value_col), lgk).alias(out_col)
    )


def hll_rollup(sketches: DataFrame, group_cols: list[str],
               sketch_col: str = "sketch",
               out_col: str = "approx_distinct") -> DataFrame:
    """Merge pre-built sketches up a hierarchy — input rows are O(groups),
    not O(data), so this runs on a laptop for a 100 TB fact table."""
    return sketches.groupBy(*group_cols).agg(
        F.hll_sketch_estimate(
            F.hll_union_agg(F.col(sketch_col), True)
        ).alias(out_col)
    )


def approx_quantiles(df: DataFrame, group_cols: list[str], value_col: str,
                     probabilities: list[float],
                     accuracy: int = 10_000) -> DataFrame:
    """Grouped approximate percentiles with bounded rank error
    (1/accuracy): the partial-aggregatable twin of the exact
    `percentile` gate query, for when the per-group value sets no
    longer fit a single reducer."""
    qcol: Column = F.approx_percentile(
        F.col(value_col),
        F.array(*[F.lit(p) for p in probabilities]),
        F.lit(accuracy),
    )
    return df.groupBy(*group_cols).agg(qcol.alias("quantiles"))
