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


# ------------------------------------------------ cuckoo sidecar (cluster)

from pushkind_crawlers_spark.operators.seen import (  # noqa: E402
    build_cuckoo_sidecar,
    filter_new_urls_sidecar,
    update_cuckoo_sidecar,
)


def _urls(spark, n, prefix="http://s"):
    c = F.col("id")
    return (
        spark.range(n)
        .select(F.concat(F.lit(prefix), (c % 8).cast("string"),
                         F.lit(".test/p/"), c.cast("string")).alias("url"))
        .select(F.xxhash64("url").alias("url_hash"), "url")
    )


def test_sidecar_filter_equals_anti_join(spark):
    """Sidecar probe + exact confirm == plain anti-join (no false
    negatives, positives string-confirmed), with and without Bloom."""
    seen = _urls(spark, 30_000)
    cand = _urls(spark, 60_000)
    side = build_cuckoo_sidecar(seen, n_shards=16).collect()
    want = {r["url"] for r in cand.join(seen.select("url"), "url", "left_anti").collect()}
    got = {r["url"] for r in
           filter_new_urls_sidecar(cand, seen, side, n_shards=16).collect()}
    assert got == want
    bloom = NumpyBloom.sized_for(30_000)
    add_to_bloom(bloom, seen, "url_hash")
    got_b = {r["url"] for r in
             filter_new_urls_sidecar(cand, seen, side, n_shards=16,
                                     bloom=bloom).collect()}
    assert got_b == want


def test_sidecar_incremental_update_equals_rebuild(spark):
    """build(seen0) then update(delta) filters exactly like build(full):
    the cross-round maintenance path is exact, not just the fresh build."""
    full = _urls(spark, 40_000)
    seen0 = full.filter(F.col("url_hash") % 3 != 0)
    delta = full.filter(F.col("url_hash") % 3 == 0)
    side0 = build_cuckoo_sidecar(seen0, n_shards=16)
    side1 = update_cuckoo_sidecar(side0, delta, n_shards=16).collect()
    cand = _urls(spark, 80_000)
    want = {r["url"] for r in cand.join(full.select("url"), "url", "left_anti").collect()}
    got = {r["url"] for r in
           filter_new_urls_sidecar(cand, full, side1, n_shards=16).collect()}
    assert got == want


def test_sidecar_degraded_shard_stays_exact(spark):
    """A filter forced to overflow flips `degraded`; its candidates fall
    back to the exact confirm — the result never loses a URL."""
    seen = _urls(spark, 20_000)
    # headroom<1 undersizes every filter -> inserts fail -> degraded
    side = build_cuckoo_sidecar(seen, n_shards=4, headroom=0.05).collect()
    assert any(r["degraded"] for r in side)
    cand = _urls(spark, 40_000)
    want = {r["url"] for r in cand.join(seen.select("url"), "url", "left_anti").collect()}
    got = {r["url"] for r in
           filter_new_urls_sidecar(cand, seen, side, n_shards=4).collect()}
    assert got == want


def test_cuckoo_filter_bytes_roundtrip():
    rng = np.random.default_rng(7)
    keys = np.unique(rng.integers(0, 2**60, size=50_000, dtype=np.int64))
    ck = CuckooFilter(capacity=len(keys) * 2)
    assert ck.insert(keys) == 0
    rt = CuckooFilter.from_bytes(ck.to_bytes(), ck.count)
    assert rt.n_buckets == ck.n_buckets and rt.count == ck.count
    assert (~rt.contains(keys)).sum() == 0


def test_sidecar_partitioned_probe_equals_anti_join(spark):
    """The at-scale cogroup probe (filters never collected to the driver)
    is exactly the anti-join, with and without the Bloom fast path."""
    from pushkind_crawlers_spark.operators.seen import (
        filter_new_urls_sidecar_partitioned,
    )

    seen = _urls(spark, 30_000)
    cand = _urls(spark, 60_000)
    side = build_cuckoo_sidecar(seen, n_shards=16)
    want = {r["url"] for r in cand.join(seen.select("url"), "url", "left_anti").collect()}
    got = {r["url"] for r in
           filter_new_urls_sidecar_partitioned(cand, seen, side, n_shards=16).collect()}
    assert got == want
    bloom = NumpyBloom.sized_for(30_000)
    add_to_bloom(bloom, seen, "url_hash")
    got_b = {r["url"] for r in
             filter_new_urls_sidecar_partitioned(cand, seen, side, n_shards=16,
                                                 bloom=bloom).collect()}
    assert got_b == want


def test_sidecar_partitioned_degraded_and_absent_shards_stay_exact(spark):
    """Cogroup probe: degraded shards AND shards missing from the sidecar
    route to the exact confirm — an incomplete sidecar degrades to
    correctness, never to re-crawls."""
    from pushkind_crawlers_spark.operators.seen import (
        filter_new_urls_sidecar_partitioned,
    )

    seen = _urls(spark, 20_000)
    side = build_cuckoo_sidecar(seen, n_shards=8, headroom=0.05)
    assert any(r["degraded"] for r in side.collect())
    # drop half the shards: an incomplete sidecar (stale-resume shape)
    partial = side.filter(F.col("shard") % 2 == 0)
    cand = _urls(spark, 40_000)
    want = {r["url"] for r in cand.join(seen.select("url"), "url", "left_anti").collect()}
    got = {r["url"] for r in
           filter_new_urls_sidecar_partitioned(cand, seen, partial, n_shards=8).collect()}
    assert got == want


def test_sidecar_broadcast_absent_shard_routes_to_exact(spark):
    """Broadcast probe twin of the above: rows collected from an
    incomplete sidecar still yield exactly the anti-join."""
    seen = _urls(spark, 20_000)
    side = build_cuckoo_sidecar(seen, n_shards=8)
    partial = [r for r in side.collect() if r["shard"] % 2 == 0]
    cand = _urls(spark, 40_000)
    want = {r["url"] for r in cand.join(seen.select("url"), "url", "left_anti").collect()}
    got = {r["url"] for r in
           filter_new_urls_sidecar(cand, seen, partial, n_shards=8).collect()}
    assert got == want


# ------------------------------------------------ broadcast probe shipping


def test_probe_blob_ships_as_broadcast_not_closure(spark):
    """The probe UDF's pickled command must NOT embed the filter blobs:
    a closure capture re-ships + re-unpickles the blobs for every task,
    which at local[32] turns the fixed blob cost into concurrent
    memory-bandwidth pressure (the dedup_sidecar 8->32 wall inversion,
    VERDICT r03 wrong #3). With an active session the state must ride a
    Spark Broadcast (small pickled reference, fetched once per worker)."""
    import cloudpickle

    from pushkind_crawlers_spark.operators.seen import (
        bloom_probe_udf,
        sidecar_probe_udf,
    )

    seen = _urls(spark, 200_000)
    bloom = NumpyBloom.sized_for(2_000_000)  # ~2.4 MB bitmap
    add_to_bloom(bloom, seen, "url_hash")
    blob_bytes = bloom.words.nbytes
    assert blob_bytes > 1_000_000

    bprobe = bloom_probe_udf(bloom)
    assert bprobe._bc is not None
    assert len(cloudpickle.dumps(bprobe.func)) < blob_bytes // 10

    side = build_cuckoo_sidecar(seen, n_shards=16).collect()
    side_bytes = sum(len(bytes(r["words"])) for r in side)
    assert side_bytes > 500_000
    sprobe = sidecar_probe_udf(side, n_shards=16, bloom=bloom)
    assert sprobe._bc is not None
    assert len(cloudpickle.dumps(sprobe.func)) < side_bytes // 10


def test_release_destroys_probe_broadcasts(spark):
    """filter outputs carry BroadcastHandles; release() after the
    terminal action destroys them (driver broadcast files would
    otherwise accumulate for the crawl's lifetime)."""
    from pushkind_crawlers_spark.caching import BroadcastHandle, release

    seen = _urls(spark, 20_000)
    cand = _urls(spark, 40_000)
    bloom = NumpyBloom.sized_for(20_000)
    add_to_bloom(bloom, seen, "url_hash")
    side = build_cuckoo_sidecar(seen, n_shards=8).collect()

    out = filter_new_urls_sidecar(cand, seen, side, n_shards=8, bloom=bloom)
    n = out.count()
    want = cand.join(seen.select("url"), "url", "left_anti").count()
    assert n == want
    handles = [h for h in getattr(out, "_persist_deps", [])
               if isinstance(h, BroadcastHandle)]
    assert handles, "sidecar filter must register its probe broadcast"
    release(out)
    assert all(h._bc is None for h in handles)

    out2 = filter_new_urls(cand, seen, bloom, confirm="anti")
    assert out2.count() == want
    handles2 = [h for h in getattr(out2, "_persist_deps", [])
                if isinstance(h, BroadcastHandle)]
    assert handles2, "bloom filter must register its probe broadcast"
    release(out2)
    assert all(h._bc is None for h in handles2)
