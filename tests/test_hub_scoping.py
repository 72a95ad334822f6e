"""Hub scoping (multi-tenant isolation): benchmark/category jobs scoped
by hub_id through the crawlers dimension touch ONLY that hub's rows
(reference: crawlers/benchmarks/categories are hub-scoped —
src/repository/crawler.rs:21-37, src/repository/category.rs:109-171)."""

from __future__ import annotations

import pytest

from pushkind_crawlers_spark import schemas
from pushkind_crawlers_spark.plans.benchmark import run_benchmark_association
from pushkind_crawlers_spark.plans.category import run_category_match
from pushkind_crawlers_spark.store.ops import RunLock
from pushkind_crawlers_spark.store.snapshots import SnapshotStore

FIELDS = dict(
    name="эталонный чай", sku="BM-1", category="Чай / Зелёный",
    units="кг", price=100.0, amount=1.0, description="benchmark row",
)


def _rows():
    """30 products: crawler 0 -> hub 1, crawler 1 -> hub 2. The first 4
    (two per crawler) carry the benchmark's exact prompt fields."""
    rows = []
    for i in range(30):
        cid = i % 2
        f = FIELDS if i < 4 else dict(
            name=f"товар {i}", sku=f"S-{i}", category=f"cat {i % 5}",
            units="шт", price=float(10 + i), amount=2.0,
            description=f"описание {i} " * 3,
        )
        rows.append((
            cid, i, f"http://s{cid}.test/p/{i:06d}", f"s{cid}.test",
            f["sku"], f["name"], f["price"], f["category"], f["units"],
            f["amount"], f["description"], [], None, f"{i:04x}", 1,
            None, None, None,
        ))
    return rows


def _prompt():
    f = FIELDS
    return (f"Name: {f['name']}\nSKU: {f['sku']}\nCategory: {f['category']}\n"
            f"Units: {f['units']}\nPrice: {f['price']}\nAmount: {f['amount']}\n"
            f"Description: {f['description']}")


@pytest.fixture()
def store(spark, tmp_path):
    st = SnapshotStore(str(tmp_path / "hubstore"))
    st.table("results", schemas.RESULTS).commit(
        spark.createDataFrame(_rows(), schemas.RESULTS))
    st.table("crawlers", schemas.CRAWLERS).commit(
        spark.createDataFrame([(0, 1, "s0"), (1, 2, "s1")], schemas.CRAWLERS))
    return st


def test_benchmark_job_hub_scoped(spark, store):
    out = run_benchmark_association(spark, store, 7, _prompt(), hub_id=1)
    # only hub 1's crawler (0) has products embedded / associated
    assert out["embedded"] == 15
    assoc = store.table("associations").read(spark).collect()
    assert len(assoc) > 0
    assert {r["crawler_id"] for r in assoc} == {0}
    rows = store.table("results").read(spark).collect()
    by_cid = {}
    for r in rows:
        by_cid.setdefault(r["crawler_id"], []).append(r["embedding"] is not None)
    assert all(by_cid[0])          # hub 1 rows embedded
    assert not any(by_cid[1])      # hub 2 rows untouched (still NULL)


def test_category_job_hub_scoped(spark, store):
    cats = spark.createDataFrame(
        [(1, "Чай / Зелёный", None), (2, "прочее", None)],
        "category_id int, name string, embedding array<float>",
    )
    out = run_category_match(spark, store, cats, threshold=0.0, hub_id=1)
    assert out["total"] == 15      # stats are hub-scoped
    rows = store.table("results").read(spark).collect()
    for r in rows:
        if r["crawler_id"] == 0:
            assert r["category_id"] is not None
            assert r["category_assignment_source"] == "automatic"
            assert r["embedding"] is not None
        else:
            # hub 2: no assignment, no embedding, no source — bit-for-bit
            assert r["category_id"] is None
            assert r["category_assignment_source"] is None
            assert r["embedding"] is None


def test_hub_locks_are_independent(spark, store):
    """Hub 2's category match runs while hub 1's lock is held — per-hub
    single-writer, cross-hub concurrency (the reference's hub-wide lock
    never blocks OTHER hubs, category.rs:135-171)."""
    cats = spark.createDataFrame(
        [(1, "Чай / Зелёный", None)],
        "category_id int, name string, embedding array<float>",
    )
    lock1 = RunLock(store, scope="hub-1")
    lock1.claim()
    try:
        out = run_category_match(spark, store, cats, threshold=0.0, hub_id=2)
        assert out["total"] == 15
    finally:
        lock1.release()


def test_interleaved_hub_commits_no_lost_update(spark, store):
    """THE r3 ADVICE-high race, exercised: hub 1's whole category job
    commits in the window between hub 2's read of the shared results
    table and hub 2's publish. With whole-table overwrite commits hub 1's
    embeddings/assignments were silently reverted (last-writer-wins);
    with bucket-scoped CAS merges hub 2's publish conflicts, retries on
    hub 1's snapshot, and BOTH hubs' writes survive."""
    from pushkind_crawlers_spark.store.snapshots import SnapshotTable

    cats = spark.createDataFrame(
        [(1, "Чай / Зелёный", None)],
        "category_id int, name string, embedding array<float>",
    )
    orig = SnapshotTable._publish_buckets
    state = {"fired": False}

    def hook(self, staged, touched, expected_current, properties):
        if not state["fired"] and self.name == "results":
            state["fired"] = True
            SnapshotTable._publish_buckets = orig
            try:
                run_category_match(spark, store, cats, threshold=0.0, hub_id=1)
            finally:
                SnapshotTable._publish_buckets = hook
        return orig(self, staged, touched, expected_current, properties)

    SnapshotTable._publish_buckets = hook
    try:
        out2 = run_category_match(spark, store, cats, threshold=0.0, hub_id=2)
    finally:
        SnapshotTable._publish_buckets = orig
    assert state["fired"], "interleave hook never fired"
    assert out2["total"] == 15

    # ground truth: the same two jobs run SEQUENTIALLY on an identical
    # store — interleaving must be indistinguishable (serializability)
    seq = SnapshotStore(store.root + "-seq")
    seq.table("results", schemas.RESULTS).commit(
        spark.createDataFrame(_rows(), schemas.RESULTS))
    seq.table("crawlers", schemas.CRAWLERS).commit(
        spark.createDataFrame([(0, 1, "s0"), (1, 2, "s1")], schemas.CRAWLERS))
    run_category_match(spark, seq, cats, threshold=0.0, hub_id=1)
    run_category_match(spark, seq, cats, threshold=0.0, hub_id=2)

    def snap(st):
        return sorted(
            (r["url"], [float(x) for x in r["embedding"]]
             if r["embedding"] is not None else None,
             r["category_id"], r["category_assignment_source"])
            for r in st.table("results").read(spark).collect()
        )

    got, want = snap(store), snap(seq)
    assert len(got) == 30
    assert got == want  # neither hub's writes were lost or reordered


def test_manual_rows_survive_hub_scoped_match(spark, store):
    """The P12 manual guard composes with hub scoping: a manual
    assignment inside the scoped hub is never overwritten."""
    from pyspark.sql import functions as F

    t = store.table("results", schemas.RESULTS)
    seeded = t.read(spark).withColumn(
        "category_id",
        F.when(F.col("url").endswith("000000"), F.lit(99))
        .otherwise(F.col("category_id")),
    ).withColumn(
        "category_assignment_source",
        F.when(F.col("url").endswith("000000"), F.lit("manual"))
        .otherwise(F.col("category_assignment_source")),
    )
    t.commit(seeded)
    cats = spark.createDataFrame(
        [(1, "Чай / Зелёный", None)],
        "category_id int, name string, embedding array<float>",
    )
    out = run_category_match(spark, store, cats, threshold=0.0, hub_id=1)
    assert out["manual_kept"] == 1
    row = [r for r in t.read(spark).collect() if r["url"].endswith("000000")][0]
    assert row["category_id"] == 99
    assert row["category_assignment_source"] == "manual"
