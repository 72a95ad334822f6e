"""Append-chain compaction (the hermetic rewrite_data_files analog).

A crawl appends one data directory per round to seen/results/...;
BENCH.md measures ~100-175ms fixed per-file cost on staged writes, and
at cluster scale O(rounds) small files inflate task counts the same
way. ``SnapshotTable.compact`` rewrites the current snapshot into one
directory without breaking time travel, and ``CrawlEngine`` can run it
every N rounds (``compact_every`` / ``--compact-every``)."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (LongType, StringType, StructField,
                               StructType)

from pushkind_crawlers_spark.store.snapshots import SnapshotStore

SCHEMA = StructType([
    StructField("k", LongType(), False),
    StructField("v", StringType(), False),
])


@pytest.fixture()
def table(spark, tmp_path):
    st = SnapshotStore(str(tmp_path / "cp"))
    t = st.table("seen", SCHEMA)
    for r in range(4):
        batch = spark.createDataFrame(
            [(r * 100 + i, f"row-{r}-{i}") for i in range(50)], SCHEMA)
        t.append(spark, batch)
    return t


def _cur_snap(t):
    m = t._read_manifest()
    return t._snapshot(m, m["current"])


def test_compact_merges_dirs_preserves_rows_and_time_travel(spark, table):
    pre = _cur_snap(table)
    assert len(pre["paths"]) == 4
    want = {(r["k"], r["v"]) for r in table.read(spark).collect()}

    sid = table.compact(spark)
    post = _cur_snap(table)
    assert post["snapshot_id"] == sid and len(post["paths"]) == 1
    assert post["row_count"] == pre["row_count"] == 200
    assert {(r["k"], r["v"]) for r in table.read(spark).collect()} == want
    # one directory, file count bounded by the byte target (tiny -> 1)
    files = glob.glob(os.path.join(post["paths"][0], "*.parquet"))
    assert len(files) == 1

    # time travel: the pre-compaction snapshot still reads in full
    old = table.read(spark, pre["snapshot_id"])
    assert {(r["k"], r["v"]) for r in old.collect()} == want

    # expire GCs the superseded per-round dirs once out of the window
    table.expire_snapshots(keep_last=1)
    for p in pre["paths"]:
        assert not os.path.exists(p)
    assert os.path.exists(post["paths"][0])


def test_compact_is_noop_below_min_dirs_and_idempotent(spark, table):
    sid = table.compact(spark)
    assert table.compact(spark) == sid          # 1 dir -> no new snapshot
    assert _cur_snap(table)["snapshot_id"] == sid


def test_compact_noop_on_bucketed_table(spark, tmp_path):
    from pushkind_crawlers_spark.store.ops import merge_upsert

    st = SnapshotStore(str(tmp_path / "bk"))
    t = st.table("results", SCHEMA)
    t.set_bucket_spec(["k"], n=4)
    batch = spark.createDataFrame([(i, f"v{i}") for i in range(40)], SCHEMA)
    sid = t.merge_commit(spark, batch,
                         lambda b, d: merge_upsert(b, d, keys=["k"]))
    assert t.compact(spark) == sid              # merge keeps buckets 1-dir


def test_crawl_with_compaction_matches_oracle(spark, small_world, tmp_path):
    """compact_every=1 after every round: parity is untouched and the
    append-chain tables end at one data directory each."""
    from pushkind_crawlers_spark.oracle import OracleCrawler
    from pushkind_crawlers_spark.plans.crawl import CrawlEngine

    eng = CrawlEngine(spark, small_world, str(tmp_path / "store"),
                      compact_every=1)
    eng.run()
    got = [r["url"] for r in eng.store.table("crawl_order").read(spark)
           .orderBy("seq").collect()]
    want = [d["url"] for d in OracleCrawler(small_world).run().order]
    assert got == want
    for name in ("seen", "results", "crawl_order"):
        snap = _cur_snap(eng.store.table(name))
        assert len(snap["paths"]) <= 1, (name, snap["paths"])
