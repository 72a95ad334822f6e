"""Priority scoring (north rule: depth + host-budget + phash novelty)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pushkind_crawlers_spark.operators.priority import (
    PriorityWeights,
    novelty_py,
    novelty_udf,
    parity_priority,
    priority_udf,
)


def test_weights_must_keep_depth_dominant():
    with pytest.raises(ValueError):
        PriorityWeights(depth=1.0, novelty=0.6, budget=0.5)


def test_novelty_boosts_within_depth_only(spark):
    """A novel phash (far from the seen sample) outranks a stale one at
    the same depth, but never beats a shallower row (§4.4 tie-break)."""
    seen = np.array([0, 1, 3], dtype=np.int64)  # low-bit cluster
    w = PriorityWeights(depth=1.0, novelty=0.4, budget=0.3)
    nov = novelty_udf(seen)
    score = priority_udf(w)
    df = spark.createDataFrame(
        pd.DataFrame({
            "name": ["shallow-stale", "deep-novel", "deep-stale"],
            "depth": [1, 2, 2],
            "phash": [0, -1, 0],        # -1 = all bits set -> max Hamming
            "backlog": [0.0, 0.0, 0.0],
        })
    )
    out = {r["name"]: r["p"] for r in df.select(
        "name",
        score(F.col("depth"), nov(F.col("phash")), F.col("backlog")).alias("p"),
    ).collect()}
    assert out["deep-novel"] > out["deep-stale"]          # novelty reorders
    assert out["shallow-stale"] > out["deep-novel"]       # depth dominates


def test_novelty_udf_matches_python_twin(spark):
    seen = np.array([0, 7, -1, 123456789], dtype=np.int64)
    nov = novelty_udf(seen)
    df = spark.createDataFrame(
        pd.DataFrame({"phash": [0, -1, 255, 123456789, None]}).astype({"phash": "Int64"})
    )
    got = [r["n"] for r in df.select(nov(F.col("phash")).alias("n")).collect()]
    want = [novelty_py(p, seen.tolist()) for p in [0, -1, 255, 123456789, None]]
    assert got == pytest.approx(want)


def test_budget_pressure_deprioritizes(spark):
    w = PriorityWeights(depth=1.0, novelty=0.0, budget=0.4)
    score = priority_udf(w)
    df = spark.createDataFrame(
        pd.DataFrame({"depth": [2, 2], "nov": [0.0, 0.0], "backlog": [0.0, 1.0]})
    )
    a, b = [r["p"] for r in df.select(
        score(F.col("depth"), F.col("nov"), F.col("backlog")).alias("p")
    ).collect()]
    assert a > b


def test_parity_fast_path_matches_udf(spark):
    df = spark.range(5).select(F.col("id").cast("int").alias("depth"))
    score = priority_udf(PriorityWeights())
    rows = df.select(
        parity_priority(F.col("depth")).alias("fast"),
        score(F.col("depth"), F.lit(0.0), F.lit(0.0)).alias("udf"),
    ).collect()
    for r in rows:
        assert r["fast"] == r["udf"]
