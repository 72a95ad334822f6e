"""Crash-window semantics of the snapshot commit protocol (north rule:
resumable from checkpoint). A crash at ANY point before the run-manifest
swap must leave the previous round fully intact for the resume path."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from pushkind_crawlers_spark.store.snapshots import SnapshotStore

SCHEMA = T.StructType([T.StructField("x", T.LongType(), False)])


def _vals(spark, table, sid=None):
    return sorted(r["x"] for r in table.read(spark, sid).collect())


def test_staged_but_unpublished_is_invisible(spark, tmp_path):
    store = SnapshotStore(str(tmp_path))
    t = store.table("t", SCHEMA)
    t.commit(spark.range(3).select(F.col("id").alias("x")))
    # crash after writing data files, before the manifest swap
    t.stage(spark.range(100, 103).select(F.col("id").alias("x")))
    assert _vals(spark, t) == [0, 1, 2]


def test_partial_round_publish_is_invisible_to_resume(spark, tmp_path):
    """commit_round publishes per-table snapshots then swaps the run
    manifest; a crash between the two leaves the run manifest on the old
    round, and resume reads THROUGH the run manifest's snapshot ids —
    never the tables' latest."""
    store = SnapshotStore(str(tmp_path))
    a = store.table("a", SCHEMA)
    b = store.table("b", SCHEMA)
    staged0 = {
        "a": a.stage(spark.range(2).select(F.col("id").alias("x"))),
        "b": b.stage(spark.range(2).select(F.col("id").alias("x"))),
    }
    store.commit_round(staged0, round_no=0, run_id="r")
    state0 = store.read_run_state()

    # round 1 "crashes" after publishing table a but before the run swap
    # (commit_round stamps every publish with run_id+round — the retry
    # recognizes the orphan as its OWN by that stamp and republishes onto
    # the pinned parent; an unstamped/foreign append would be rebased
    # onto instead, see test_foreign_append_rebase below)
    pa, na = a.stage(spark.range(10, 12).select(F.col("id").alias("x")))
    a.publish(pa, na, {"run_id": "r", "round": 1}, mode="append")
    state = store.read_run_state()
    assert state == state0                       # run manifest unmoved
    # resume path: read through the recorded snapshot ids
    assert _vals(spark, a, state["snapshot_ids"]["a"]) == [0, 1]
    # the orphaned newer snapshot exists but is simply not referenced
    assert _vals(spark, a) == [0, 1, 10, 11]

    # the retried round pins its append parents to the snapshots it READ
    # (state0) — the orphan must not be double-appended onto
    staged1 = {
        "a": a.stage(spark.range(10, 12).select(F.col("id").alias("x"))),
        "b": b.stage(spark.range(10, 12).select(F.col("id").alias("x"))),
    }
    store.commit_round(staged1, round_no=1, run_id="r",
                       append_tables={"a", "b"},
                       parents=state0["snapshot_ids"])
    state = store.read_run_state()
    assert state["round"] == 1
    assert _vals(spark, a, state["snapshot_ids"]["a"]) == [0, 1, 10, 11]
    assert _vals(spark, b, state["snapshot_ids"]["b"]) == [0, 1, 10, 11]


def test_foreign_append_rebase(spark, tmp_path):
    """A FOREIGN writer (different run_id — e.g. an analytics job's
    merge) committing to a shared table between a round's read and its
    publish must survive: the round's append rebases onto the foreign
    snapshot (appends commute) instead of silently forking it off."""
    store = SnapshotStore(str(tmp_path))
    t = store.table("results", SCHEMA)
    staged0 = {"results": t.stage(spark.range(2).select(F.col("id").alias("x")))}
    store.commit_round(staged0, round_no=0, run_id="crawl")
    state0 = store.read_run_state()

    # crawl stages round 1's delta, then a foreign job commits
    staged1 = {"results": t.stage(
        spark.range(10, 12).select(F.col("id").alias("x")))}
    pf, nf = t.stage(spark.range(100, 102).select(F.col("id").alias("x")))
    t.publish(pf, nf, {"run_id": "analytics-job"}, mode="append")

    store.commit_round(staged1, round_no=1, run_id="crawl",
                       append_tables={"results"},
                       parents=state0["snapshot_ids"])
    state = store.read_run_state()
    # BOTH the foreign job's rows and the round's delta are present
    assert _vals(spark, t, state["snapshot_ids"]["results"]) == [
        0, 1, 10, 11, 100, 101]


def test_foreign_overwrite_conflict_fails_loud(spark, tmp_path):
    """An overwrite-mode round commit racing a foreign writer must raise,
    never silently revert the other writer (r3 ADVICE high)."""
    import pytest

    from pushkind_crawlers_spark.store.snapshots import CommitConflictError

    store = SnapshotStore(str(tmp_path))
    t = store.table("frontier", SCHEMA)
    staged0 = {"frontier": t.stage(spark.range(2).select(F.col("id").alias("x")))}
    store.commit_round(staged0, round_no=0, run_id="crawl")
    state0 = store.read_run_state()

    staged1 = {"frontier": t.stage(
        spark.range(10, 12).select(F.col("id").alias("x")))}
    pf, nf = t.stage(spark.range(100, 102).select(F.col("id").alias("x")))
    t.publish(pf, nf, {"run_id": "someone-else"})
    with pytest.raises(CommitConflictError):
        store.commit_round(staged1, round_no=1, run_id="crawl",
                           parents=state0["snapshot_ids"])


def test_sidecar_resume_matches_uninterrupted(spark, small_world, tmp_path_factory):
    """Interrupt a sidecar-mode crawl after 2 rounds and resume with a
    FRESH engine: the sidecar table rehydrates from its committed
    snapshot (no rebuild from seen) and the finished crawl equals an
    uninterrupted one round-for-round."""
    from pushkind_crawlers_spark.plans.crawl import CrawlEngine

    r_full = str(tmp_path_factory.mktemp("sidecar_full"))
    full = CrawlEngine(spark, small_world, r_full, seen_mode="sidecar",
                       sidecar_shards=8, run_id="full")
    full.run()
    want = [
        (r["seq"], r["url"]) for r in
        full.store.table("crawl_order").read(spark).orderBy("seq").collect()
    ]

    r_part = str(tmp_path_factory.mktemp("sidecar_part"))
    part = CrawlEngine(spark, small_world, r_part, seen_mode="sidecar",
                       sidecar_shards=8, run_id="part")
    part.run(max_rounds=2)
    resumed = CrawlEngine(spark, small_world, r_part, seen_mode="sidecar",
                          sidecar_shards=8, run_id="part")
    resumed.run(resume=True)
    got = [
        (r["seq"], r["url"]) for r in
        resumed.store.table("crawl_order").read(spark).orderBy("seq").collect()
    ]
    assert got == want
