"""E7 composed category-match job: hub lock, memoized embeddings, top-1
assignment with the manual guard, stats counters
(/root/reference/src/processing/category.rs:33-309)."""

from __future__ import annotations

import pytest

from pushkind_crawlers_spark import schemas
from pushkind_crawlers_spark.plans.category import run_category_match
from pushkind_crawlers_spark.store.ops import RunLock, RunLockError
from pushkind_crawlers_spark.store.snapshots import SnapshotStore

CAT_NAMES = ["зелёный чай", "чёрный чай", "посуда"]


def _rows():
    rows = []
    for i in range(30):
        # products 0-9 literally named like category 0, 10-19 like cat 1,
        # 20-29 noise; rows %7==0 are MANUAL with a pinned category 2
        if i < 10:
            name = CAT_NAMES[0]
        elif i < 20:
            name = CAT_NAMES[1]
        else:
            name = f"случайный товар {i}"
        manual = i % 7 == 0
        rows.append((
            i % 2, i, f"http://h{i % 2}.test/p/{i:06d}", f"h{i % 2}.test",
            f"S-{i}", name, 10.0 + i, None, "шт", 1.0, None, [], None,
            f"{i:04x}", 1, None,
            2 if manual else None, "manual" if manual else None,
        ))
    return rows


@pytest.fixture()
def store(spark, tmp_path):
    st = SnapshotStore(str(tmp_path / "cstore"))
    st.table("results", schemas.RESULTS).commit(
        spark.createDataFrame(_rows(), schemas.RESULTS)
    )
    return st


@pytest.fixture()
def categories(spark):
    return spark.createDataFrame(
        [(k, n, None) for k, n in enumerate(CAT_NAMES)],
        "category_id int, name string, embedding array<float>",
    )


def test_category_match_assigns_and_guards(spark, store, categories):
    THRESH = 0.25
    out = run_category_match(spark, store, categories, threshold=THRESH)
    assert out["embedded"] == 30
    rows = {r["url_hash"]: r for r in store.table("results").read(spark).collect()}

    # twin: recompute expected top-1 per product from the persisted
    # product embeddings + deterministically re-embedded category names
    # (sequential-fold dot, 4dp rounding, category_id tie-break — exactly
    # the engine's math)
    from pyspark.sql import functions as F

    from pushkind_crawlers_spark.operators.similarity import fill_missing_embeddings

    cat_vecs = {
        r["category_id"]: r["embedding"]
        for r in fill_missing_embeddings(
            categories.withColumn("prompt", F.col("name"))
        ).collect()
    }

    def top1(emb):
        best = None
        for cid in sorted(cat_vecs):
            acc = 0.0
            for xv, yv in zip(emb, cat_vecs[cid]):
                acc += float(xv) * float(yv)
            sim = round(acc, 4)
            if best is None or sim > best[1]:
                best = (cid, sim)
        return best

    n_auto = n_unmatched = 0
    for i, r in rows.items():
        if i % 7 == 0:
            # P12 guard: manual rows keep their pinned category, always
            assert r["category_assignment_source"] == "manual"
            assert r["category_id"] == 2
            continue
        cid, sim = top1(r["embedding"])
        if sim >= THRESH:
            assert r["category_id"] == cid, (i, sim)
            assert r["category_assignment_source"] == "automatic"
            n_auto += 1
        else:
            assert r["category_id"] is None, (i, sim)
            assert r["category_assignment_source"] is None
            n_unmatched += 1
    assert n_auto > 0 and n_unmatched > 0  # both branches exercised
    n_manual = sum(1 for i in rows if i % 7 == 0)
    assert out["manual_kept"] == n_manual
    assert out["matched_automatic"] == n_auto
    assert out["unmatched"] == n_unmatched

    # memoization: second run embeds nothing and is idempotent
    out2 = run_category_match(spark, store, categories, threshold=THRESH)
    assert out2["embedded"] == 0
    assert out2["matched_automatic"] == out["matched_automatic"]


def test_category_match_respects_hub_lock(spark, store, categories):
    lock = RunLock(store, scope="hub")
    lock.claim()
    try:
        with pytest.raises(RunLockError):
            run_category_match(spark, store, categories)
    finally:
        lock.release()
    assert not RunLock(store, scope="hub").is_locked()
