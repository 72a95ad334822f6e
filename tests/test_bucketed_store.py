"""Partition-scoped MERGE commits + optimistic concurrency (r3 VERDICT
top-next + ADVICE high).

Contract under test: a point MERGE into an N-bucket table stages ONLY
the touched buckets (commit bytes ∝ delta, not table), untouched buckets
carry forward by manifest reference, and interleaved read-modify-write
writers serialize through the publish CAS instead of silently reverting
each other."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from pushkind_crawlers_spark.store.ops import merge_upsert, set_embeddings
from pushkind_crawlers_spark.store.snapshots import (
    CommitConflictError,
    SnapshotStore,
    SnapshotTable,
)

SCHEMA = ("url string, crawler_id int, price double, "
          "embedding array<float>, category_id int")
N = 16


def _upsert(base, batch):
    return merge_upsert(base, batch, keys=["url"])


@pytest.fixture()
def table(spark, tmp_path):
    from pyspark.sql.types import (ArrayType, DoubleType, FloatType,
                                   IntegerType, StringType, StructField,
                                   StructType)

    schema = StructType([
        StructField("url", StringType(), False),
        StructField("crawler_id", IntegerType(), False),
        StructField("price", DoubleType(), False),
        StructField("embedding", ArrayType(FloatType()), True),
        StructField("category_id", IntegerType(), True),
    ])
    st = SnapshotStore(str(tmp_path / "bk"))
    t = st.table("results", schema)
    t.set_bucket_spec(["url"], n=N)
    rows = [(f"http://h.test/p/{i:04d}", i % 3, float(i), None, None)
            for i in range(400)]
    t.merge_commit(spark, spark.createDataFrame(rows, schema), _upsert)
    return t


def _snap(t: SnapshotTable) -> dict:
    m = t._read_manifest()
    return t._snapshot(m, m["current"])


def test_point_merge_stages_only_touched_buckets(spark, table):
    before = _snap(table)
    assert set(before["bucket_paths"]) <= {str(b) for b in range(N)}
    batch = spark.createDataFrame(
        [("http://h.test/p/0007", 99, 777.0, None, None)],
        table.schema,
    )
    table.merge_commit(spark, batch, _upsert)
    after = _snap(table)

    changed = [b for b in after["bucket_paths"]
               if after["bucket_paths"][b] != before["bucket_paths"].get(b)]
    assert len(changed) == 1  # one key -> one bucket rewritten
    unchanged = [b for b in after["bucket_paths"] if b not in changed]
    # untouched buckets carry forward by REFERENCE (same directories)
    assert all(after["bucket_paths"][b] == before["bucket_paths"][b]
               for b in unchanged)
    assert len(unchanged) >= N - 1

    # values: the upsert landed, every other row survived bit-for-bit
    out = {r["url"]: r["price"] for r in table.read(spark).collect()}
    assert len(out) == 400
    assert out["http://h.test/p/0007"] == 777.0
    assert out["http://h.test/p/0006"] == 6.0


def test_merge_commit_insert_new_keys(spark, table):
    batch = spark.createDataFrame(
        [("http://new.test/x", 5, 1.5, None, None)], table.schema)
    table.merge_commit(spark, batch, _upsert)
    assert table.read(spark).count() == 401
    assert table.row_count() == 401  # manifest row accounting matches


def test_empty_batch_is_a_noop(spark, table):
    sid = table.current_snapshot_id()
    empty = spark.createDataFrame([], table.schema)
    assert table.merge_commit(spark, empty, _upsert) == sid
    assert table.current_snapshot_id() == sid


def test_interleaved_writers_both_survive(spark, table):
    """Writer A reads, writer B commits, A's CAS publish conflicts and
    the merge retries on B's snapshot — the exact lost-update the old
    whole-table overwrite had (two hub jobs on shared results)."""
    t = table
    a_batch = spark.createDataFrame(
        [("http://h.test/p/0001", 0, 0.0, [1.0, 2.0], None)], t.schema)
    b_batch = spark.createDataFrame(
        [("http://h.test/p/0002", 0, 0.0, None, 42)], t.schema)

    fired = {"done": False}
    orig_publish = t._publish_buckets

    def racing_publish(staged, touched, expected_current, properties):
        if not fired["done"]:
            fired["done"] = True
            # writer B sneaks a full merge_commit in between A's read
            # and A's publish
            t._publish_buckets = orig_publish
            t.merge_commit(
                spark, b_batch,
                lambda base, b: merge_upsert(
                    base, b, keys=["url"], update_cols=["category_id"]),
            )
            t._publish_buckets = racing_publish
        return orig_publish(staged, touched, expected_current, properties)

    t._publish_buckets = racing_publish
    try:
        t.merge_commit(
            spark, a_batch,
            lambda base, b: merge_upsert(
                base, b, keys=["url"], update_cols=["embedding"]),
        )
    finally:
        t._publish_buckets = orig_publish

    rows = {r["url"]: r for r in t.read(spark).collect()}
    # BOTH writers' updates survive; neither reverted the other
    assert [float(x) for x in rows["http://h.test/p/0001"]["embedding"]] == [1.0, 2.0]
    assert rows["http://h.test/p/0002"]["category_id"] == 42
    assert rows["http://h.test/p/0001"]["price"] == 1.0  # untouched col kept


def test_cas_conflict_raises_after_retries(spark, table):
    """Sustained contention (every attempt loses the race) fails loud."""
    t = table
    batch = spark.createDataFrame(
        [("http://h.test/p/0003", 9, 9.0, None, None)], t.schema)
    orig = t._publish_buckets

    def always_conflict(staged, touched, expected_current, properties):
        raise CommitConflictError("simulated sustained contention")

    t._publish_buckets = always_conflict
    try:
        with pytest.raises(CommitConflictError):
            t.merge_commit(spark, batch, _upsert, max_retries=2)
    finally:
        t._publish_buckets = orig


def test_replace_where_with_empty_batch_still_wipes(spark, tmp_path):
    """extra_touched forces the wiped key's bucket into the commit even
    when the fresh batch is empty (the reference's per-benchmark
    association wipe must delete stale rows regardless)."""
    st = SnapshotStore(str(tmp_path / "aw"))
    t = st.table("assoc")
    sch = "benchmark_id int, product_url string, sim double"
    t.schema = spark.createDataFrame([], sch).schema
    t.set_bucket_spec(["benchmark_id"], n=8)
    seedf = spark.createDataFrame(
        [(7, "u1", 0.9), (7, "u2", 0.85), (3, "u9", 0.95)], sch)
    t.merge_commit(spark, seedf, lambda base, b: b)

    wipe = spark.createDataFrame([(7,)], "benchmark_id int")
    t.merge_commit(
        spark, spark.createDataFrame([], sch),
        lambda base, b: base.filter(F.col("benchmark_id") != 7).unionByName(b),
        extra_touched=wipe,
    )
    left = [(r["benchmark_id"], r["product_url"])
            for r in t.read(spark).collect()]
    assert left == [(3, "u9")]  # 7's rows wiped, 3's untouched


def test_legacy_flat_snapshot_converts_once(spark, tmp_path):
    """First merge onto a plain commit() snapshot is a one-time
    conversion; the SECOND merge is bucket-scoped."""
    st = SnapshotStore(str(tmp_path / "cv"))
    sch = "url string, v int"
    t = st.table("tt")
    t.schema = spark.createDataFrame([], sch).schema
    t.commit(spark.createDataFrame([(f"u{i}", i) for i in range(100)], sch))
    t.set_bucket_spec(["url"], n=8)

    t.merge_commit(spark, spark.createDataFrame([("u1", -1)], sch),
                   lambda b, x: merge_upsert(b, x, keys=["url"]))
    s1 = _snap(t)
    assert "bucket_paths" in s1 and len(s1["bucket_paths"]) >= 1

    t.merge_commit(spark, spark.createDataFrame([("u2", -2)], sch),
                   lambda b, x: merge_upsert(b, x, keys=["url"]))
    s2 = _snap(t)
    changed = [b for b in s2["bucket_paths"]
               if s2["bucket_paths"][b] != s1["bucket_paths"].get(b)]
    assert len(changed) == 1
    vals = {r["url"]: r["v"] for r in t.read(spark).collect()}
    assert vals["u1"] == -1 and vals["u2"] == -2 and vals["u3"] == 3
    assert len(vals) == 100


def test_expire_gc_drops_superseded_bucket_dirs(spark, table):
    """Superseded bucket directories (and their emptied stage roots) are
    GC'd; directories still referenced by kept snapshots survive."""
    batch = spark.createDataFrame(
        [("http://h.test/p/0011", 1, 11.5, None, None)], table.schema)
    table.merge_commit(spark, batch, _upsert)
    table.merge_commit(spark, batch, _upsert)  # supersede again
    table.expire_snapshots(keep_last=1)
    # table still reads fully after GC
    out = {r["url"]: r["price"] for r in table.read(spark).collect()}
    assert len(out) == 400 and out["http://h.test/p/0011"] == 11.5
    # every referenced path exists on disk
    for p in _snap(table)["paths"]:
        assert os.path.isdir(p), p


def test_set_embeddings_merge_fn_composes(spark, table):
    """ops.set_embeddings slots straight in as a merge_fn (the shape the
    benchmark/category jobs use)."""
    embs = spark.createDataFrame(
        [("http://h.test/p/0005", [0.5, 0.5])],
        "url string, embedding array<float>")
    table.merge_commit(spark, embs, set_embeddings)
    rows = {r["url"]: r["embedding"] for r in table.read(spark).collect()}
    assert [float(x) for x in rows["http://h.test/p/0005"]] == [0.5, 0.5]
    assert rows["http://h.test/p/0004"] is None
