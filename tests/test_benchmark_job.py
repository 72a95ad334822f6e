"""E6 composed benchmark-association job: store roundtrip + memoization +
lock semantics (mirrors test_crawl_parity's structure for the analytics
tail; reference flow /root/reference/src/processing/benchmark.rs:112-192)."""

from __future__ import annotations

import numpy as np
import pytest

from pushkind_crawlers_spark import schemas
from pushkind_crawlers_spark.operators.similarity import hash_embed_udf
from pushkind_crawlers_spark.plans.benchmark import run_benchmark_association
from pushkind_crawlers_spark.store.ops import RunLock, RunLockError
from pushkind_crawlers_spark.store.snapshots import SnapshotStore

BENCH_PROMPT_FIELDS = dict(
    name="эталонный чай", sku="BM-1", category="Чай / Зелёный",
    units="кг", price=100.0, amount=1.0, description="benchmark row",
)


def _results_rows():
    """40 products over 2 crawlers; two per crawler share the benchmark's
    exact prompt fields (sim == 1.0 — passes the 0.8 bar), the rest get
    distinct field soup (hash-embed sims near 0)."""
    rows = []
    for i in range(40):
        cid = i % 2
        if i in (0, 1, 2, 3):
            f = BENCH_PROMPT_FIELDS
        else:
            f = dict(name=f"товар {i}", sku=f"S-{i}", category=f"cat {i % 5}",
                     units="шт", price=float(10 + i), amount=2.0,
                     description=f"описание {i} " * 3)
        rows.append((
            cid, i, f"http://s{cid}.test/p/{i:06d}", f"s{cid}.test",
            f["sku"], f["name"], f["price"], f["category"], f["units"],
            f["amount"], f["description"], [], None, f"{i:04x}", 1,
            None, None, None,
        ))
    return rows


@pytest.fixture()
def store(spark, tmp_path):
    st = SnapshotStore(str(tmp_path / "bstore"))
    t = st.table("results", schemas.RESULTS)
    t.commit(spark.createDataFrame(_results_rows(), schemas.RESULTS))
    return st


def _bench_prompt():
    f = BENCH_PROMPT_FIELDS
    return (f"Name: {f['name']}\nSKU: {f['sku']}\nCategory: {f['category']}\n"
            f"Units: {f['units']}\nPrice: {f['price']}\nAmount: {f['amount']}\n"
            f"Description: {f['description']}")


def test_benchmark_job_roundtrip_and_memoization(spark, store):
    out1 = run_benchmark_association(spark, store, 7, _bench_prompt(), k=10)
    assert out1["embedded"] == 40           # first run embeds every product
    assert out1["bench_embedded"] is True

    assoc = store.table("associations").read(spark).collect()
    assert len(assoc) == out1["associations"] > 0
    per_crawler: dict[int, list] = {}
    for r in assoc:
        assert r["benchmark_id"] == 7
        assert r["sim"] >= 0.8              # E5 threshold enforced
        per_crawler.setdefault(r["crawler_id"], []).append(r)
    for cid, rows in per_crawler.items():
        assert len(rows) <= 10              # E6 k bound
        # the planted exact-prompt products (sim 1.0) must be present
        planted = {u for u in (f"http://s{cid}.test/p/{i:06d}"
                               for i in range(4) if i % 2 == cid)}
        got = {r["product_url"] for r in rows if r["sim"] == 1.0}
        assert planted <= got

    # P6 persistence: embeddings written back; rerun embeds nothing
    prods = store.table("results").read(spark).collect()
    assert all(r["embedding"] is not None for r in prods)
    out2 = run_benchmark_association(spark, store, 7, _bench_prompt(), k=10)
    assert out2["embedded"] == 0            # E3 memoization
    assert out2["bench_embedded"] is False  # benchmark vector memoized too
    assert out2["associations"] == out1["associations"]

    # P9 stats
    stats = {r["crawler_id"]: r["num_products"]
             for r in store.table("benchmark_stats").read(spark).collect()}
    assert stats == {cid: len(rows) for cid, rows in per_crawler.items()}


def test_benchmark_job_matches_numpy_twin(spark, store):
    run_benchmark_association(spark, store, 7, _bench_prompt(), k=10, threshold=0.0)
    prods = store.table("results").read(spark).collect()
    embed = hash_embed_udf()  # noqa: F841  (UDF parity is embed_fill's gate)
    bvec = None
    for r in store.table("benchmarks").read(spark).collect():
        if r["benchmark_id"] == 7:
            bvec = np.asarray(r["embedding"], dtype=np.float64)
    assert bvec is not None
    # python twin of the top-k per crawler; the dot is a sequential
    # left-fold exactly like Spark's F.aggregate (BLAS pairwise summation
    # can differ in the last ulp, which flips 4dp rounding at boundaries)
    want: dict[int, list] = {}
    for r in prods:
        acc = 0.0
        for xv, yv in zip(r["embedding"], bvec):
            acc += float(xv) * float(yv)
        sim = round(acc, 4)
        want.setdefault(r["crawler_id"], []).append((-sim, r["url"]))
    assoc = store.table("associations").read(spark).collect()
    got = {}
    for r in assoc:
        got.setdefault(r["crawler_id"], set()).add(r["product_url"])
    for cid, pairs in want.items():
        pairs.sort()
        # the job filters sim >= threshold (0.0 here) after the k-cut
        assert got[cid] == {u for s, u in pairs[:10] if -s >= 0.0}


def test_benchmark_job_respects_busy_flag(spark, store):
    lock = RunLock(store, scope="benchmark-7")
    lock.claim()
    try:
        with pytest.raises(RunLockError):
            run_benchmark_association(spark, store, 7, _bench_prompt())
    finally:
        lock.release()
    # released-on-failure semantics: a crashing job frees the flag
    class Boom(RuntimeError):
        pass
    try:
        with RunLock(store, scope="benchmark-7"):
            raise Boom()
    except Boom:
        pass
    assert not RunLock(store, scope="benchmark-7").is_locked()


def test_cli_dispatch_benchmark_and_category(spark, store, capsys):
    """The reference's three ZMQ entry points map onto the spark-submit
    CLI (--job); the benchmark and category jobs run in-process here
    against the prepared store (crawl is E2E-covered elsewhere)."""
    import json
    import sys

    sys.path.insert(0, "/root/repo")
    import spark_submit_main as M

    M.main(["--store", store.root, "--job", "benchmark",
            "--benchmark-id", "7", "--benchmark-prompt", _bench_prompt()],
           _stop_session=False)
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["benchmark_id"] == 7
    assert out["associations"] == 4  # the 4 exact-prompt products pass 0.8

    M.main(["--store", store.root, "--job", "category",
            "--categories", "1:Чай / Зелёный,2:прочее"],
           _stop_session=False)
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["total"] == 40


def test_benchmark_job_leaves_other_benchmarks_untouched(spark, store):
    """The memoization write-back is a MERGE point update (P6), not a
    table rewrite: pre-existing benchmark rows survive the commit
    bit-for-bit (reference anchor src/repository/benchmark.rs:29-47)."""
    bench_t = store.table("benchmarks", schemas.BENCHMARKS)
    other = (3, "Name: другой эталон\nSKU: BM-3", [0.5, 0.25, 0.125])
    stale = (9, "Name: без вектора", None)
    bench_t.commit(spark.createDataFrame([other, stale], schemas.BENCHMARKS))

    out = run_benchmark_association(spark, store, 7, _bench_prompt(), k=10)
    assert out["bench_embedded"] is True

    rows = {r["benchmark_id"]: r for r in bench_t.read(spark).collect()}
    assert set(rows) == {3, 7, 9}
    assert rows[3]["prompt"] == other[1]
    assert [float(x) for x in rows[3]["embedding"]] == other[2]
    assert rows[9]["prompt"] == stale[1] and rows[9]["embedding"] is None
    assert rows[7]["embedding"] is not None

    # memoized rerun: no new benchmarks snapshot at all
    sid = bench_t.current_snapshot_id()
    out2 = run_benchmark_association(spark, store, 7, _bench_prompt(), k=10)
    assert out2["bench_embedded"] is False
    assert bench_t.current_snapshot_id() == sid
