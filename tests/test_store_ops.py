"""Persistence parity ops (SURVEY.md §2.3/2.4) + snapshot-store behaviors."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pushkind_crawlers_spark.store.ops import (
    RunLock,
    RunLockError,
    assign_categories_guarded,
    cascade_delete,
    clear_categories_guarded,
    list_products,
    merge_upsert,
    replace_children,
    set_embeddings,
    update_stats,
)
from pushkind_crawlers_spark.store.snapshots import SnapshotStore


@pytest.fixture()
def results_df(spark):
    rows = [
        # crawler_id, url, sku, price, image_ids, category_id, source, round
        (1, "http://a/p/1", "A1", 10.0, ["i1", "i2"], 7, "manual", 1),
        (1, "http://a/p/2", "A2", 20.0, ["i3"], None, None, 1),
        (2, "http://b/p/1", "B1", 30.0, ["i4"], 9, "automatic", 2),
        (2, "http://b/p/2", "B2", 40.0, [], None, None, 2),
    ]
    return spark.createDataFrame(
        rows,
        "crawler_id int, url string, sku string, price double,"
        " image_ids array<string>, category_id int,"
        " category_assignment_source string, round int",
    ).withColumn("embedding", F.lit(None).cast("array<float>"))


def test_list_products_assembles_images(spark, results_df):
    images = spark.createDataFrame(
        [("i1", b"b1", "c1"), ("i2", b"b2", "c2"), ("i3", b"b3", "c3"), ("i4", b"b4", "c4")],
        "image_id string, bytes binary, caption string",
    )
    got = {r["url"]: r for r in list_products(results_df, images, crawler_id=1).collect()}
    assert set(got) == {"http://a/p/1", "http://a/p/2"}
    p1 = got["http://a/p/1"]["product_images"]
    assert [im["image_id"] for im in p1] == ["i1", "i2"]
    assert bytes(p1[0]["bytes"]) == b"b1" and p1[1]["caption"] == "c2"


def test_merge_upsert(spark, results_df):
    batch = spark.createDataFrame(
        [(1, "http://a/p/2", 25.0), (1, "http://a/p/9", 99.0)],
        "crawler_id int, url string, price double",
    )
    merged = merge_upsert(results_df, batch, keys=["crawler_id", "url"],
                          update_cols=["price"])
    got = {r["url"]: r for r in merged.collect()}
    assert len(got) == 5
    assert got["http://a/p/2"]["price"] == 25.0          # matched -> updated
    assert got["http://a/p/2"]["sku"] == "A2"            # non-update col kept
    assert got["http://a/p/9"]["price"] == 99.0          # unmatched -> insert
    assert got["http://a/p/1"]["price"] == 10.0          # untouched


def test_cascade_delete(spark, results_df):
    images = spark.createDataFrame(
        [("i1",), ("i2",), ("i3",), ("i4",)], "image_id string"
    )
    assoc = spark.createDataFrame(
        [("http://a/p/1", 5), ("http://b/p/1", 6)], "product_url string, benchmark_id int"
    )
    kept_r, kept_i, kept_a = cascade_delete(results_df, images, assoc, crawler_id=1)
    assert {r["url"] for r in kept_r.collect()} == {"http://b/p/1", "http://b/p/2"}
    assert {r["image_id"] for r in kept_i.collect()} == {"i4"}
    assert [r["product_url"] for r in kept_a.collect()] == ["http://b/p/1"]


def test_replace_children(spark, results_df):
    images = spark.createDataFrame(
        [("i1",), ("i2",), ("i3",), ("i4",)], "image_id string"
    )
    parents = results_df.filter(F.col("url") == "http://a/p/1")
    new_images = spark.createDataFrame([("i1b",), ("i2b",)], "image_id string")
    out = replace_children(images, parents, new_images)
    assert {r["image_id"] for r in out.collect()} == {"i3", "i4", "i1b", "i2b"}


def test_set_embeddings(spark, results_df):
    emb = spark.createDataFrame(
        [("http://a/p/1", [0.5, 0.5])], "url string, embedding array<float>"
    )
    out = {r["url"]: r["embedding"] for r in set_embeddings(results_df, emb).collect()}
    assert out["http://a/p/1"] == [0.5, 0.5]
    assert out["http://a/p/2"] is None


def test_update_stats(spark, results_df):
    got = {r["crawler_id"]: (r["num_products"], r["last_round"])
           for r in update_stats(results_df).collect()}
    assert got == {1: (2, 1), 2: (2, 2)}


def test_assign_categories_never_overwrites_manual(spark, results_df):
    assignments = spark.createDataFrame(
        [("http://a/p/1", 99), ("http://a/p/2", 42)], "url string, category_id int"
    )
    out = {r["url"]: (r["category_id"], r["category_assignment_source"])
           for r in assign_categories_guarded(results_df, assignments).collect()}
    assert out["http://a/p/1"] == (7, "manual")        # guard held
    assert out["http://a/p/2"] == (42, "automatic")    # applied
    assert out["http://b/p/1"] == (9, "automatic")     # untouched


def test_clear_categories_guarded(spark, results_df):
    out = {r["url"]: r["category_id"]
           for r in clear_categories_guarded(results_df, crawler_id=1).collect()}
    assert out["http://a/p/1"] == 7       # manual survives
    assert out["http://a/p/2"] is None
    assert out["http://b/p/1"] == 9       # other crawler untouched


def test_run_lock(tmp_path):
    store = SnapshotStore(str(tmp_path))
    lock = RunLock(store)
    with lock:
        with pytest.raises(RunLockError):
            RunLock(store).claim()        # busy-guard (G1)
    RunLock(store).claim()                # released on exit -> claimable

    # release-on-failure (fixes SPEC.md:353 flag leak)
    failing = RunLock(store, scope="x")
    with pytest.raises(ValueError):
        with failing:
            raise ValueError("job blew up")
    RunLock(store, scope="x").claim()

    # stale locks are breakable
    stale = RunLock(store, scope="y", ttl_s=0.0)
    stale.claim_path = None
    RunLock(store, scope="y", ttl_s=0.0).claim()
    RunLock(store, scope="y", ttl_s=0.0).claim()


def test_snapshot_delta_append_and_rollback(spark, tmp_path):
    from pyspark.sql import types as T

    schema = T.StructType([T.StructField("x", T.LongType(), False)])
    store = SnapshotStore(str(tmp_path))
    t = store.table("t", schema)
    s1 = t.commit(spark.range(3).select(F.col("id").alias("x")))
    s2 = t.append(spark, spark.range(3, 5).select(F.col("id").alias("x")))
    assert t.row_count(s1) == 3 and t.row_count(s2) == 5
    assert t.read(spark).count() == 5
    # delta snapshot shares the parent's files
    snaps = {s["snapshot_id"]: s for s in t.snapshots()}
    assert snaps[s1]["paths"][0] in snaps[s2]["paths"]
    # time travel + rollback
    assert t.read(spark, s1).count() == 3
    t.rollback(s1)
    assert t.read(spark).count() == 3
    # expire keeps any file a kept snapshot still references
    t.rollback(s2)
    for i in range(6):
        t.append(spark, spark.range(1).select(F.lit(100 + i).cast("long").alias("x")))
    t.expire_snapshots(keep_last=2)
    assert t.read(spark).count() == 11  # 5 + 6 appended singletons
