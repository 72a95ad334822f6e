"""Membership-structure properties (axis A): no false negatives, ever.

Regression anchor: CuckooFilter._b1 used the raw key's low bits for
bucketing; inside a cogroup partition all keys share ``h mod n_partitions``
so the bucket space collapsed n_partitions-fold, inserts silently failed,
and dropped keys surfaced as false negatives (= re-fetched URLs) at
~3.5% on a 2M-seen frontier. _b1 now rehashes, and a failed insert
degrades the bucket to exact-set confirmation.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from pushkind_crawlers_spark.operators.seen import (
    CuckooFilter,
    NumpyBloom,
    add_to_bloom,
    filter_new_urls,
)


def test_bloom_no_false_negatives():
    rng = np.random.default_rng(1)
    keys = np.unique(rng.integers(-2**63, 2**63 - 1, size=500_000, dtype=np.int64))
    b = NumpyBloom.sized_for(len(keys))
    b.add(keys)
    assert (~b.might_contain(keys)).sum() == 0


def test_bloom_fpp_reasonable():
    rng = np.random.default_rng(2)
    keys = rng.integers(0, 2**62, size=200_000, dtype=np.int64)
    other = rng.integers(-2**62, -1, size=200_000, dtype=np.int64)
    b = NumpyBloom.sized_for(len(keys))
    b.add(keys)
    fpp = b.might_contain(other).mean()
    assert fpp < 0.05


@pytest.mark.parametrize("residue_mod", [None, 64])
def test_cuckoo_no_false_negatives(residue_mod):
    """Random keys AND the adversarial cogroup pattern (shared low bits)."""
    rng = np.random.default_rng(3)
    base = rng.integers(0, 2**57, size=40_000, dtype=np.int64)
    keys = np.unique(base * residue_mod + 17 if residue_mod else base)
    ck = CuckooFilter(capacity=len(keys))
    failures = ck.insert(keys)
    assert failures == 0
    assert (~ck.contains(keys)).sum() == 0


@pytest.mark.parametrize("confirm", ["cuckoo", "anti"])
def test_filter_new_urls_exact(spark, confirm):
    """filter_new_urls == exact anti-join on a 60k/30k frontier with full
    hash-residue structure (the distributed regression case), for both
    confirm strategies."""
    n_seen, n_cand = 30_000, 60_000
    url = lambda c: F.concat(  # noqa: E731
        F.lit("http://s"), (c % 8).cast("string"), F.lit(".test/p/"), c.cast("string")
    )
    seen = (
        spark.range(n_seen)
        .select(url(F.col("id")).alias("url"))
        .select(F.xxhash64("url").alias("url_hash"), "url",
                F.lit("h").alias("host"), F.lit(0).alias("discovered_round"))
    )
    cand = (
        spark.range(n_cand)
        .select(url(F.col("id")).alias("url"))
        .select(F.xxhash64("url").alias("url_hash"), "url")
    )
    bloom = NumpyBloom.sized_for(n_seen)
    add_to_bloom(bloom, seen, "url_hash")
    got = {r["url"] for r in filter_new_urls(cand, seen, bloom, confirm=confirm).collect()}
    want = {r["url"] for r in cand.join(seen.select("url"), "url", "left_anti").collect()}
    assert got == want
    assert len(got) == n_cand - n_seen
