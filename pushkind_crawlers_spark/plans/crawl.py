"""The BFS crawl engine: a driver loop of budget-bounded frontier rounds.

Each round is one Spark job chain (SURVEY.md §3.1 "Spark shape"):

    frontier ->(axis B) politeness-join + host-salted budget truncation
             -> mapInPandas fetch (pluggable; synthetic world in tests)
             -> parse / validate / variant-explode (JVM column exprs)
             -> link discovery (posexplode + pagination synthesis)
             ->(axis A) first-wins dedup + Bloom/cuckoo seen filter
             -> robots split -> priority scoring (Arrow UDF)
             -> one atomic multi-table snapshot commit

Replaces the reference's Tokio ``join_all`` level barriers
(/root/reference/src/crawlers/wintergreen.rs:160-189) with BSP supersteps;
the per-round commit (frontier/seen/results/images/order/lineage) is the
resumable checkpoint the north rule requires.
"""

from __future__ import annotations

import os
import time
import uuid
from dataclasses import dataclass, field
from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import schemas
from ..functions.parsing import (
    amount_col,
    price_col,
    unescape_entities_col,
    units_col,
    validate_products,
)
from ..functions.urlnorm import canonicalize_url_udf, host_of
from ..operators.budget import (
    host_splits,
    parse_robots_full_py,
    schedule_round,
    split_by_robots,
)
from ..operators.ordering import global_sequence
from ..operators.priority import (
    PriorityWeights,
    novelty_udf,
    parity_priority,
    priority_udf,
)
from ..caching import carry, release
from ..operators.seen import (NumpyBloom, add_to_bloom, build_cuckoo_sidecar,
                              filter_new_urls, filter_new_urls_sidecar,
                              filter_new_urls_sidecar_partitioned,
                              resolve_seen_mode, update_cuckoo_sidecar)
from ..store.snapshots import SnapshotStore
from ..synth.phash import gray32, phash64_batch
from ..synth.worldgen import SyntheticWorld

_FETCHED_COLS = [f.name for f in schemas.FETCHED.fields]

# images + the parent page's url_hash (novelty attribution)
_IMG_DECODED = T.StructType(
    list(schemas.IMAGES.fields) + [T.StructField("url_hash", T.LongType(), True)]
)


def hseg_col(idx) -> F.Column:
    """4-hex-digit ord segment, JVM-side (matches oracle.hseg)."""
    return F.lpad(F.lower(F.hex(idx)), 4, "0")


def make_world_fetch_fn(world: SyntheticWorld) -> Callable:
    """mapInPandas fetch stage against the synthetic world.

    This is the engine's I/O boundary (the reference's ``fetch_html``,
    wintergreen.rs:44-53): one 'GET' per frontier row, Arrow-batched in
    and out.  A production HTTP fetcher plugs in with the same signature.
    """

    def fetch_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url_hash, url, host, depth, ordv in zip(
                pdf["url_hash"], pdf["url"], pdf["host"], pdf["depth"], pdf["ord"]
            ):
                base = {
                    "url_hash": url_hash, "url": url, "host": host,
                    "depth": int(depth), "ord": ordv, "ok": False, "kind": None,
                    "last_page": None, "page_labels": None, "out_links": None, "sku": None,
                    "name": None, "category": None, "units_raw": None,
                    "price_str": None, "amount_str": None, "description": None,
                    "variants_json": None, "images": None,
                }
                doc = world.fetch(url)
                if doc is not None:
                    base.update(
                        ok=True, kind=doc.kind, last_page=int(doc.last_page),
                        page_labels=list(doc.page_labels) or None,
                        out_links=list(doc.out_links),
                    )
                    if doc.images:
                        # any page kind may carry imagery (category banners
                        # feed the parent-scoped novelty term)
                        base["images"] = [
                            {"image_id": im["image_id"], "bytes": im["bytes"],
                             "caption": im["caption"]}
                            for im in doc.images
                        ]
                    if doc.payload:
                        p = doc.payload
                        base.update(
                            sku=p["sku"], name=p["name"], category=p["category"],
                            units_raw=p["units"], price_str=p["price_str"],
                            amount_str=p["amount_str"], description=p["description"],
                            variants_json=doc.variants_json,
                        )
                rows.append(base)
            yield pd.DataFrame(rows, columns=_FETCHED_COLS)

    return fetch_fn


def decode_images_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched image decode + batched-DCT phash (input_hint columns).

    The container is sniffed from magic bytes per payload (PNG exact,
    LJQ1 lossy with the PSNR>=40dB parity bar); fmt lands in the images
    table so downstream consumers know which invariant applies."""
    from ..operators.multimodal import decode_image, sniff_format

    for pdf in batches:
        n = len(pdf)
        ws, hs, fmts, grays = [], [], [], np.zeros((n, 32, 32))
        for i, data in enumerate(pdf["bytes"]):
            raw = bytes(data)
            fmt = sniff_format(raw)
            px = decode_image(raw, fmt)
            hs.append(px.shape[0])
            ws.append(px.shape[1])
            fmts.append(fmt)
            grays[i] = gray32(px)
        # passthrough columns (parent url_hash / host for novelty lineage)
        extra = [c for c in pdf.columns if c not in ("image_id", "bytes", "caption")]
        out = pdf[["image_id", "bytes", "caption", *extra]].copy()
        out["w"] = pd.Series(ws, index=pdf.index, dtype="int32")
        out["h"] = pd.Series(hs, index=pdf.index, dtype="int32")
        out["fmt"] = fmts
        out["phash"] = phash64_batch(grays)
        yield out[["image_id", "bytes", "w", "h", "fmt", "caption", "phash", *extra]]


@dataclass
class RoundMetrics:
    round: int
    scheduled: int = 0
    fetched: int = 0
    links_discovered: int = 0
    links_new: int = 0
    results_rows: int = 0
    wall_s: float = 0.0
    # per-phase wall decomposition (r06, guide §1): each entry is the
    # time from the previous staging barrier to this one — the driver
    # latency + job wall of that phase. Rendered by
    # scripts/crawl_phases.py into BENCH-able evidence.
    phases: dict[str, float] = field(default_factory=dict)


@dataclass
class CrawlRun:
    run_id: str
    rounds: int = 0
    total_scheduled: int = 0
    metrics: list[RoundMetrics] = field(default_factory=list)


class CrawlEngine:
    def __init__(
        self,
        spark: SparkSession,
        world: SyntheticWorld,
        store_root: str,
        seeds: list[str] | None = None,
        weights: PriorityWeights | None = None,
        use_bloom: bool = True,
        use_robots: bool = True,
        bloom_expected: int = 1 << 20,
        run_id: str | None = None,
        keep_images: bool = True,
        round_window_s: float | None = None,
        seen_mode: str = "auto",
        sidecar_shards: int = 32,
        sidecar_broadcast_max_bytes: int = 64 << 20,
        expire_keep_last: int | None = None,
        compact_every: int | None = None,
        fetch_fn: Callable | None = None,
        robots_fn: Callable | None = None,
    ):
        self.spark = spark
        self.world = world
        # I/O seam (the reference's fetch_html, wintergreen.rs:44-53):
        # ``fetch_fn`` is the mapInPandas page-fetch stage, ``robots_fn``
        # the host -> robots.txt text fetcher. Defaults run against the
        # in-process synthetic world; production wires
        # plans.http_fetch.make_http_fetch_fn / http_robots_txt_fn over a
        # live transport — the engine is oblivious to which one runs.
        self._fetch_fn = fetch_fn if fetch_fn is not None else make_world_fetch_fn(world)
        self._robots_fn = robots_fn if robots_fn is not None else world.robots_txt
        self.store = SnapshotStore(store_root)
        self.seeds = seeds if seeds is not None else world.seed_urls()
        self.weights = weights or PriorityWeights()
        self.use_bloom = use_bloom
        self.use_robots = use_robots
        self.run_id = run_id or uuid.uuid4().hex[:12]
        self.keep_images = keep_images
        # seen-filter strategy (axis A): "anti" = Bloom + JVM anti-join
        # confirm (single-node optimal); "cuckoo" = per-bucket cogroup
        # confirm; "sidecar" = incrementally-maintained per-shard cuckoo
        # filters, snapshot-committed with the round (the cluster shape:
        # per-round dedup never rescans the seen table except to
        # string-confirm the few filter positives).  The default "auto"
        # resolves by deployment mode so the shipping configuration is
        # the one whose scaling evidence exists (r4 VERDICT wrong #1):
        # anti on local[N] masters, sidecar on real clusters.
        self.seen_mode = resolve_seen_mode(seen_mode, spark.sparkContext.master)
        self.sidecar_shards = sidecar_shards
        # past this total filter-blob size the sidecar probe switches from
        # driver-collected broadcast to the partitioned cogroup path
        # (VERDICT r02 "wrong" #3: at 10^9+ seen keys the blobs total
        # hundreds of MB — beyond sane closure/broadcast size)
        self.sidecar_broadcast_max_bytes = sidecar_broadcast_max_bytes
        # retention: a crawl of thousands of rounds otherwise accumulates
        # snapshot records (each append snapshot lists every prior data
        # dir -> manifest JSON grows O(rounds^2)) and per-round staged
        # intermediates under _work (O(rounds) disk). N = keep the last N
        # rounds' snapshots + staging dirs after each commit; None = keep
        # everything (time travel / debugging). Resume only ever reads
        # the LAST committed round, so any N >= 1 is resume-safe.
        self.expire_keep_last = expire_keep_last
        # every N rounds, rewrite the append-chain tables' accumulated
        # per-round data dirs into one (SnapshotTable.compact) — long
        # crawls otherwise read O(rounds) directories of small files
        self.compact_every = compact_every
        self.bloom: NumpyBloom | None = (
            NumpyBloom.sized_for(bloom_expected) if use_bloom else None
        )
        self._work = os.path.join(store_root, "_work")
        # robots.txt is FETCHED and PARSED (sectioned, User-agent: *) per
        # host — a distributed stage like any page fetch, producing the
        # (host, prefix | crawl_delay_s) rules table; nothing arrives out
        # of band. Crawl-delay caps the per-round budget when a round
        # window is configured.
        self.round_window_s = round_window_s
        if use_robots:
            fetched_rules = self._fetch_robots_rules(
                [h["host"] for h in world.politeness_rows()]
            )
            self._robots_df = fetched_rules.filter(
                F.col("prefix").isNotNull()
            ).select("host", "prefix")
            self._delays_df = fetched_rules.filter(
                F.col("crawl_delay_s").isNotNull()
            ).select("host", "crawl_delay_s")
        else:
            self._robots_df = spark.createDataFrame([], "host string, prefix string")
            self._delays_df = spark.createDataFrame([], "host string, crawl_delay_s double")
        self._tables = {
            "frontier": schemas.FRONTIER,
            "seen": schemas.SEEN,
            "results": schemas.RESULTS,
            "rejects": schemas.REJECTS,
            "images": schemas.IMAGES,
            "crawl_order": schemas.CRAWL_ORDER,
            "lineage": schemas.LINEAGE,
        }
        if self.seen_mode == "sidecar":
            self._tables["seen_sidecar"] = schemas.SEEN_SIDECAR
        for name, schema in self._tables.items():
            self.store.table(name, schema)
        self._politeness = F.broadcast(
            spark.createDataFrame(
                [
                    (r["host"], r["budget_per_round"], r["robots_disallow"], r["crawl_delay_ms"])
                    for r in world.politeness_rows()
                ],
                schemas.POLITENESS,
            )
        )
        self._site_dim = F.broadcast(
            spark.createDataFrame(
                [
                    (hc.host, hc.idx, hc.page_param, hc.last_page_rule,
                     getattr(hc, "amount_source", "combined"))
                    for hc in (world.host_config(h) for h in world.cfg.hosts())
                ],
                "host string, crawler_id int, page_param string, "
                "last_page_rule string, amount_source string",
            )
        )

    # ------------------------------------------------------------------

    def _fetch_robots_rules(self, hosts: list[str]) -> DataFrame:
        """GET+parse /robots.txt per host, distributed: one mapInPandas
        over the host list (at 10^6+ hosts this is just another fetch
        stage), yielding the (host, prefix) rules dimension. Hosts whose
        robots.txt is absent/unfetchable get no rules (allow-all)."""
        robots_fn = self._robots_fn

        def fetch_parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                rows = {"host": [], "prefix": [], "crawl_delay_s": []}
                for h in pdf["host"]:
                    prefixes, delay = parse_robots_full_py(robots_fn(h))
                    for prefix in prefixes:
                        rows["host"].append(h)
                        rows["prefix"].append(prefix)
                        rows["crawl_delay_s"].append(None)
                    if delay is not None:
                        rows["host"].append(h)
                        rows["prefix"].append(None)
                        rows["crawl_delay_s"].append(float(delay))
                yield pd.DataFrame(rows)

        hosts_df = self.spark.createDataFrame(
            [(h,) for h in hosts], "host string"
        )
        schema = "host string, prefix string, crawl_delay_s double"
        rules = hosts_df.mapInPandas(fetch_parse, schema)
        # materialize once (tiny: rules rows only) — consumed every round
        path = os.path.join(self._work, "robots_rules")
        rules.write.mode("overwrite").parquet(path)
        return self.spark.read.schema(schema).parquet(path)

    def _stage_df(self, df: DataFrame, round_no: int, name: str) -> tuple[DataFrame, int]:
        """Materialize an intermediate once (deterministic reuse across the
        several consumers in a round — the local stand-in for a cached
        shuffle stage).  Returns (re-read frame, row count); the count comes
        from the parquet footers, not a Spark job."""
        path = os.path.join(self._work, f"round-{round_no:06d}", name)
        df.write.mode("overwrite").parquet(path)
        from ..store.snapshots import parquet_rows

        return self.spark.read.schema(df.schema).parquet(path), parquet_rows(path)

    def _init_frontier(self) -> None:
        spark = self.spark
        seed_df = spark.createDataFrame(
            [(u, i) for i, u in enumerate(self.seeds)], "raw_url string, seed_idx int"
        )
        canon = (
            seed_df.withColumn("url", canonicalize_url_udf(F.col("raw_url")))
            .withColumn("host", host_of(F.col("url")))
            .withColumn("ord", hseg_col(F.col("seed_idx")))
            .withColumn("url_hash", F.xxhash64("url"))
            .withColumn("depth", F.lit(0))
            .withColumn("priority", parity_priority(F.lit(0)))
            .withColumn("discovered_round", F.lit(0))
            .withColumn("parent_hash", F.lit(None).cast("long"))
        )
        w = Window.partitionBy("url_hash", "url").orderBy("ord")
        frontier0 = (
            canon.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select(*[f.name for f in schemas.FRONTIER.fields])
        )
        seen0 = frontier0.select(
            "url_hash", "url", "host", F.lit(0).alias("discovered_round")
        )
        # r06: stage the 7-8 round-0 snapshots concurrently (same pattern
        # as the round's delta pool — sequential staging paid one ~0.4 s
        # job latency per table) and seed the bloom from the staged seen
        # files driver-side instead of a Spark collect job.
        from concurrent.futures import ThreadPoolExecutor

        to_stage: dict[str, DataFrame] = {"frontier": frontier0, "seen": seen0}
        if self.seen_mode == "sidecar":
            to_stage["seen_sidecar"] = build_cuckoo_sidecar(
                seen0, self.sidecar_shards)
        for name in ("results", "rejects", "images", "crawl_order", "lineage"):
            to_stage[name] = self.spark.createDataFrame([], self._tables[name])
        with ThreadPoolExecutor(max_workers=len(to_stage)) as ex:
            futs = {name: ex.submit(self.store.table(name).stage, df)
                    for name, df in to_stage.items()}
            staged = {name: f.result() for name, f in futs.items()}
        self.store.commit_round(staged, round_no=0, run_id=self.run_id)
        if self.bloom is not None:
            import glob as _glob

            import pyarrow.parquet as _pq

            for f in _glob.glob(os.path.join(staged["seen"][0], "*.parquet")):
                t = _pq.read_table(f, columns=["url_hash"])
                self.bloom.add(
                    t["url_hash"].to_numpy(zero_copy_only=False).astype(np.int64))

    def _read_state(self) -> tuple[dict, dict[str, DataFrame]]:
        state = self.store.read_run_state()
        dfs = {
            name: self.store.table(name).read(self.spark, state["snapshot_ids"].get(name))
            for name in self._tables
        }
        return state, dfs

    # ------------------------------------------------------------------

    def run(self, max_rounds: int | None = None, resume: bool = False) -> CrawlRun:
        import time as _time

        if not resume or self.store.read_run_state() is None:
            self._init_frontier()
        elif self.bloom is not None:
            # resume: rebuild the bloom from the committed seen snapshot
            _, dfs = self._read_state()
            self.bloom = NumpyBloom(self.bloom.n_bits, self.bloom.n_hashes)
            add_to_bloom(self.bloom, dfs["seen"], "url_hash")

        run = CrawlRun(run_id=self.run_id)
        while True:
            state, dfs = self._read_state()
            round_no = state["round"] + 1
            if max_rounds is not None and run.rounds >= max_rounds:
                break
            # emptiness check from the committed manifest (no Spark job)
            if self.store.table("frontier").row_count(
                state["snapshot_ids"]["frontier"]
            ) == 0:
                break
            frontier = dfs["frontier"]
            t0 = _time.time()
            m = self._run_round(round_no, state, dfs)
            m.wall_s = _time.time() - t0
            run.metrics.append(m)
            run.rounds += 1
            run.total_scheduled += m.scheduled
        return run

    # ------------------------------------------------------------------

    def _run_round(self, round_no: int, state: dict, dfs: dict[str, DataFrame]) -> RoundMetrics:
        frontier, seen = dfs["frontier"], dfs["seen"]
        m = RoundMetrics(round=round_no)
        _t = time.time()

        def _mark(phase: str) -> None:
            nonlocal _t
            now = time.time()
            m.phases[phase] = round(now - _t, 3)
            _t = now

        # ---- axis B: politeness budget truncation (host-salted) ----------
        splits = host_splits(frontier)
        scheduled = schedule_round(
            frontier, self._politeness, splits=splits,
            delays=self._delays_df if self.round_window_s else None,
            round_window_s=self.round_window_s,
        )
        scheduled, m.scheduled = self._stage_df(scheduled, round_no, "scheduled")
        _mark("schedule")
        if m.scheduled == 0:
            # frontier rows exist but nothing schedulable -> terminate cleanly
            staged = {"frontier": self.store.table("frontier").stage(frontier.limit(0))}
            self.store.commit_round(staged, round_no, self.run_id)
            return m

        remainder = frontier.join(
            scheduled.select("url_hash", "url"), ["url_hash", "url"], "left_anti"
        )

        # ---- crawl-order seq (range-partitioned global numbering — no
        # single-reducer sort; see operators/ordering.py) ------------------
        seq_base = int(state.get("seq_base", 0))
        seq_df = global_sequence(
            scheduled.select("url_hash", "url", "host", "depth", "ord"),
            ["depth", "ord"], base=seq_base,
        )
        order_rows = carry(seq_df.select(
            "seq", F.lit(round_no).alias("round"),
            "url_hash", "url", "host", "depth", "ord",
        ), seq_df)

        # ---- fetch stage (mapInPandas over frontier partitions) ----------
        # Budget truncation leaves the batch partitioned by (host, salt) —
        # at most n_hosts×splits partitions, which caps fetch parallelism
        # at the host count and concentrates hot hosts. Spread the fetch
        # by url_hash across the full executor width: politeness is
        # already enforced (per-ROUND budgets, not per-instant), so fetch
        # placement is free.
        n_par = int(self.spark.conf.get("spark.sql.shuffle.partitions"))
        fetched = (
            scheduled.select("url_hash", "url", "host", "depth", "ord")
            .repartition(n_par, "url_hash")
            .mapInPandas(self._fetch_fn, schemas.FETCHED)
        )
        fetched, _ = self._stage_df(fetched, round_no, "fetched")
        _mark("fetch")

        # ---- results: parse + validate + variant explosion ----------------
        from concurrent.futures import ThreadPoolExecutor

        products = fetched.filter((F.col("kind") == "product") & F.col("ok"))
        results_parsed, rejects_new = self._build_results(products, round_no)
        # stage straight into the results table's data dir — the commit
        # publishes this same directory, so the round writes results once.
        # r06 (guide §2.6 — overlap independent jobs): the results branch
        # and the link-discovery branch both read only the staged
        # `fetched` parquet, so the results staging job runs on a driver
        # thread WHILE the image/discovery/seen chain proceeds; the
        # future resolves before lineage (which reads the staged rows).
        # At bench scale this hides ~1.5 s/round of pure job wall.
        results_pool = ThreadPoolExecutor(max_workers=1)
        results_future = results_pool.submit(
            self.store.table("results").stage, results_parsed)
        rejects_val = rejects_new.select(
            "url", "host", "reject_reason", F.lit(round_no).alias("round")
        )
        _mark("parse_results")

        # ---- images: decode + phash (input_hint columns) ------------------
        # every fetched page's imagery (products + category banners); the
        # parent url_hash rides through the decode so the novelty term can
        # attribute each phash to the page that served it
        decoded = None
        if self.keep_images:
            img_in = (
                fetched.filter(F.col("ok") & F.col("images").isNotNull())
                .select("url_hash", F.explode("images").alias("im"))
                .select("url_hash", "im.image_id", "im.bytes", "im.caption")
            )
            decoded = img_in.mapInPandas(decode_images_fn, _IMG_DECODED)
            if self.weights.novelty > 0.0:
                # two consumers (images table + novelty agg): stage once
                decoded, _ = self._stage_df(decoded, round_no, "images_decoded")
            images_new = decoded.select(*[f.name for f in schemas.IMAGES.fields])
        else:
            images_new = self.spark.createDataFrame([], schemas.IMAGES)
        _mark("image_decode")

        # ---- link discovery ----------------------------------------------
        candidates = self._discover_links(fetched, round_no)
        candidates, m.links_discovered = self._stage_df(candidates, round_no, "candidates")
        _mark("link_discovery")
        discovered_by_host = candidates.groupBy("host").agg(
            F.count("*").alias("links_discovered")
        )

        # first-wins intra-batch dedup (ord order == discovery order)
        w = Window.partitionBy("url_hash", "url").orderBy("ord")
        deduped = (
            candidates.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        # axis A: bloom fast path + seen-filter confirm; the surviving
        # links are staged ONCE, then split against the robots rules
        # table with a host-keyed semi/anti join (JVM startswith
        # predicate — no driver dict, no Python in the match)
        if self.seen_mode == "sidecar":
            side_df = dfs["seen_sidecar"]
            # Staleness guard (ADVICE r02): rounds committed under
            # seen_mode='anti' leave the run manifest with NO
            # 'seen_sidecar' snapshot id, so _read_state fell back to the
            # table's 'current' pointer — possibly an OLDER sidecar-mode
            # run whose filters lack newer seen keys (probe false
            # negatives -> re-crawled duplicates). Rebuild from the seen
            # snapshot this round actually reads whenever the manifest
            # lacks the sidecar entry, not merely when the table is empty.
            sizing = (F.count(F.lit(1)).alias("n"),
                      F.coalesce(F.sum(F.length("words")), F.lit(0)).alias("blob_bytes"))
            stats = side_df.agg(*sizing).first()
            if "seen_sidecar" not in state["snapshot_ids"] or stats["n"] == 0:
                rebuilt = build_cuckoo_sidecar(seen, self.sidecar_shards)
                side_df, _ = self._stage_df(rebuilt, round_no, "sidecar_rebuilt")
                stats = side_df.agg(*sizing).first()
            self._sidecar_df = side_df
            if stats["blob_bytes"] > self.sidecar_broadcast_max_bytes:
                # filters too big to ship via closure: partitioned probe
                filtered = filter_new_urls_sidecar_partitioned(
                    deduped, seen, side_df, self.sidecar_shards, self.bloom
                )
            else:
                # collect is O(n_shards) rows — config-sized broadcast
                filtered = filter_new_urls_sidecar(
                    deduped, seen, side_df.collect(), self.sidecar_shards,
                    self.bloom,
                )
        else:
            filtered = filter_new_urls(deduped, seen, self.bloom,
                                       confirm=self.seen_mode)
        new_links, _ = self._stage_df(filtered, round_no, "new_links")
        release(filtered)  # probe caches served their terminal write
        _mark("seen_filter")
        allowed, robots_rejected = split_by_robots(new_links, self._robots_df)

        # ---- priority scoring (Arrow UDFs unless parity fast path) --------
        # novelty is PARENT-scoped: each new link inherits the mean
        # min-Hamming (vs the already-seen phash sample) of the images on
        # the page that discovered it, so links from pages serving novel
        # imagery are crawled sooner. The depth term dominates, so only
        # within-depth order changes (SURVEY.md §4.4 tie-break contract).
        if self.weights.novelty > 0.0 or self.weights.budget > 0.0:
            joined = allowed
            nov_col = F.lit(0.0)
            press_col = F.lit(0.0)
            if self.weights.novelty > 0.0:
                if decoded is None:
                    raise ValueError("novelty weight requires keep_images=True")
                # deterministic seen-sample: first 4096 phashes by image_id
                # (TakeOrdered — a bare limit() samples nondeterministically)
                sample = np.array(
                    [r["phash"] for r in dfs["images"].select("image_id", "phash")
                     .orderBy("image_id").limit(4096).collect()],
                    dtype=np.int64,
                )
                nov = novelty_udf(sample)
                parent_nov = (
                    decoded.select("url_hash", "phash")
                    .withColumn("_nov1", nov(F.col("phash")))
                    .groupBy("url_hash")
                    .agg(F.avg("_nov1").alias("_novelty"))
                    .withColumnRenamed("url_hash", "parent_hash")
                )
                joined = joined.join(parent_nov, "parent_hash", "left")
                nov_col = F.coalesce(F.col("_novelty"), F.lit(0.0))
            if self.weights.budget > 0.0:
                budgets = self._politeness.select(
                    "host", F.col("budget_per_round").alias("_bud")
                )
                press = (
                    remainder.groupBy("host").agg(F.count(F.lit(1)).alias("_bk"))
                    .join(budgets, "host", "left")
                    .select(
                        "host",
                        (F.col("_bk") / (F.col("_bk") + F.coalesce(F.col("_bud"), F.lit(5))))
                        .alias("_press"),
                    )
                )
                joined = joined.join(press, "host", "left")
                press_col = F.coalesce(F.col("_press"), F.lit(0.0))
            score = priority_udf(self.weights)
            frontier_add = (
                joined.withColumn("priority", score(F.col("depth"), nov_col, press_col))
                .drop("_novelty", "_press")
            )
        else:
            frontier_add = allowed.withColumn("priority", parity_priority(F.col("depth")))
        frontier_add = frontier_add.select(
            "url_hash", "url", "host", "depth", "ord", "priority",
            F.lit(round_no).alias("discovered_round"), "parent_hash",
        )

        # ---- lineage metrics per host -------------------------------------
        results_staged = results_future.result()  # overlap ends here
        results_pool.shutdown()
        results_new = self.spark.read.schema(schemas.RESULTS).parquet(results_staged[0])
        _mark("results_stage_wait")
        lineage_new = self._build_lineage(
            round_no, scheduled, fetched, discovered_by_host, allowed,
            robots_rejected, results_new, rejects_val,
        )

        # ---- atomic multi-table commit (delta appends, Iceberg-style) -----
        # Only this round's rows are written; the manifest links the new
        # data dirs to the parent snapshot's — O(delta) per round, never
        # O(history), which is what survives a 10^10-row seen table.
        frontier_next = remainder.unionByName(frontier_add)
        seen_add = allowed.unionByName(robots_rejected).select(
            "url_hash", "url", "host", F.lit(round_no).alias("discovered_round")
        )
        rejects_all = rejects_val.unionByName(
            robots_rejected.select(
                "url", "host", F.lit("robots").alias("reject_reason"),
                F.lit(round_no).alias("round"),
            )
        )
        # stage the 7 delta snapshots CONCURRENTLY (independent writes —
        # Spark schedules jobs from multiple driver threads fine; the
        # expensive inputs are already parquet-staged so each write is a
        # cheap scan+write, and overlapping them hides per-job latency)
        to_stage = {
            "frontier": frontier_next,
            "seen": seen_add,
            "rejects": rejects_all,
            "images": images_new,
            "crawl_order": order_rows,
            "lineage": lineage_new,
        }
        if self.seen_mode == "sidecar":
            # steady-state maintenance: insert only this round's delta
            # keys into the per-shard filters; the full seen table is
            # never rescanned. Overwrite-committed (O(n_shards) rows).
            to_stage["seen_sidecar"] = update_cuckoo_sidecar(
                self._sidecar_df, seen_add, self.sidecar_shards
            )
        # pool width covers every delta in one wave (7-8 staging jobs of
        # ~0.5 s driver latency each — 4 workers meant two waves, r06)
        with ThreadPoolExecutor(max_workers=len(to_stage)) as ex:
            futs = {
                name: ex.submit(self.store.table(name).stage, df)
                for name, df in to_stage.items()
            }
            staged = {name: f.result() for name, f in futs.items()}
        _mark("stage_deltas")
        release(order_rows)  # crawl_order staged: drop the seq checkpoint
        staged["results"] = results_staged  # written once, earlier
        m.results_rows = staged["results"][1]
        # remaining metrics from the staged lineage files (driver-side read)
        import glob as _glob

        import pyarrow.parquet as _pq

        for f in _glob.glob(os.path.join(staged["lineage"][0], "*.parquet")):
            t = _pq.read_table(f, columns=["fetched", "links_new"])
            m.fetched += int(t["fetched"].to_pandas().sum())
            m.links_new += int(t["links_new"].to_pandas().sum())
        self.store.commit_round(
            staged, round_no, self.run_id,
            extra={"seq_base": seq_base + m.scheduled},
            append_tables={"seen", "results", "rejects", "images",
                           "crawl_order", "lineage"},
            # append onto the snapshots this round READ — a crash between
            # per-table publish and the run swap followed by a retry must
            # not double-append onto the orphaned snapshot
            parents=state["snapshot_ids"],
        )
        _mark("commit")
        if self.bloom is not None:
            # r06: the round's seen delta is already ON DISK (just staged
            # and committed) and is round-delta sized, so OR it into the
            # bloom with a driver-side pyarrow read of the staged files —
            # the r05 shape re-ran a Spark collect job over the same rows
            # (~0.85 s/round of pure job latency at bench scale). Resume
            # still uses the distributed add_to_bloom over the full seen
            # table, where a driver read would not scale.
            for f in _glob.glob(os.path.join(staged["seen"][0], "*.parquet")):
                t = _pq.read_table(f, columns=["url_hash"])
                self.bloom.add(
                    t["url_hash"].to_numpy(zero_copy_only=False).astype(np.int64))
        _mark("bloom_update")
        if (self.compact_every is not None
                and round_no % self.compact_every == 0):
            # rewrite each append-chain table's O(rounds) data dirs into
            # one (store.compact docstring has the measured cost model);
            # before expire so a small retention window can GC the
            # superseded dirs immediately
            for name in ("seen", "results", "rejects", "images",
                         "crawl_order", "lineage"):
                self.store.table(name).compact(self.spark)
        if self.expire_keep_last is not None:
            self._expire(round_no)
        _mark("compact_expire")
        return m

    def _expire(self, round_no: int) -> None:
        """Bound retention after a commit: expire old table snapshots
        (GCs data dirs no kept snapshot references — e.g. superseded
        frontier overwrites) and drop staged intermediates of rounds
        older than the window."""
        import glob as _glob
        import shutil as _shutil

        for name in self._tables:
            self.store.table(name).expire_snapshots(self.expire_keep_last)
        keep = {
            f"round-{r:06d}"
            for r in range(max(1, round_no - self.expire_keep_last + 1),
                           round_no + 1)
        }
        for d in _glob.glob(os.path.join(self._work, "round-*")):
            if os.path.basename(d) not in keep:
                _shutil.rmtree(d, ignore_errors=True)

    # ------------------------------------------------------------------

    def _build_results(self, products: DataFrame, round_no: int):
        """S1-S4 + F7: parse raw strings, validate, explode variants."""
        base = (
            products.join(
                self._site_dim.select("host", "crawler_id", "amount_source"),
                "host", "left")
            .withColumn("price", price_col(F.col("price_str")))
            .withColumn(
                "image_ids",
                F.transform(F.coalesce(F.col("images"), F.array()), lambda im: im["image_id"]),
            )
            .withColumn(
                "caption",
                F.when(F.size("images") > 0, F.col("images")[0]["caption"]),
            )
        )
        has_var = base.filter(
            F.col("variants_json").isNotNull() & (F.col("variants_json") != "")
        )
        no_var = base.filter(
            F.col("variants_json").isNull() | (F.col("variants_json") == "")
        )
        # per-site amount source (SURVEY §2.6): 'combined' parses "150 г"
        # out of one string (S2); 'spans' sites carry a bare number in
        # amount_str and the units verbatim in units_raw — the reference
        # parses the numeric span with ','->'.' + space strip and a 0.0
        # default (wintergreen.rs:261-274, tea101.rs:259-272)
        spans_amount = F.coalesce(
            F.regexp_replace(F.translate(F.col("amount_str"), ",", "."),
                             r"[\s ]+", "").try_cast("double"),
            F.lit(0.0),
        )
        is_spans = F.col("amount_source") == "spans"
        plain = (
            no_var.withColumn(
                "amount",
                F.when(is_spans, spans_amount)
                .otherwise(amount_col(F.col("amount_str"))),
            )
            .withColumn(
                "units",
                F.when(is_spans, F.col("units_raw"))
                .otherwise(units_col(F.col("amount_str"))),
            )
            .withColumn("out_url", F.col("url"))
        )
        # S6: entity-decode before parse (rusteaco.rs:275) — the embedded
        # JSON may arrive HTML-escaped; JVM replace chain. Shape: the real
        # store wraps the list in an object ({"variants":[...]} —
        # rusteaco.rs ProductJson), some feeds emit the bare array; accept
        # both (whichever schema doesn't match parses to NULL).
        _unescaped = unescape_entities_col(F.col("variants_json"))
        _variants = F.coalesce(
            F.from_json(
                _unescaped,
                T.StructType([T.StructField(
                    "variants", T.ArrayType(schemas.VARIANT))]),
            )["variants"],
            F.from_json(_unescaped, T.ArrayType(schemas.VARIANT)),
        )
        exploded = (
            has_var.withColumn("variant", F.explode(_variants))
            .withColumn("sku", F.col("variant.sku"))
            .withColumn("price", F.col("variant.price"))
            .withColumn("amount", amount_col(F.col("variant.title")))
            .withColumn("units", units_col(F.col("variant.title")))
            .withColumn("out_url", F.concat("url", F.lit("#"), F.col("variant.sku")))
            .drop("variant")
        )
        sel = [
            "crawler_id", "url_hash", F.col("out_url").alias("url"), "host",
            "sku", "name", "price", "category", "units", "amount",
            "description", "image_ids", "caption", "ord",
            F.lit(round_no).alias("round"),
        ]
        union = plain.select(*sel).unionByName(exploded.select(*sel))
        valid, rejects = validate_products(union)
        # final first-wins dedup by result URL (F8, wintergreen.rs:184-188)
        w = Window.partitionBy("url").orderBy("ord")
        valid = (
            valid.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
            .withColumn("embedding", F.lit(None).cast("array<float>"))
            .withColumn("category_id", F.lit(None).cast("int"))
            .withColumn("category_assignment_source", F.lit(None).cast("string"))
            .select(*[f.name for f in schemas.RESULTS.fields])
        )
        return valid, rejects

    def _discover_links(self, fetched: DataFrame, round_no: int) -> DataFrame:
        """F1/F2/F3: out-link + pagination expansion with ord propagation."""
        ok = fetched.filter("ok")
        seed_links = (
            ok.filter(F.col("kind") == "seed")
            .select(
                "url_hash", "ord",
                F.posexplode("out_links").alias("pos", "child_url"),
            )
            .withColumn("child_depth", F.lit(1))
            .withColumn("child_ord", F.concat("ord", hseg_col(F.col("pos"))))
        )
        cat = ok.filter(F.col("kind") == "category").join(
            self._site_dim.select("host", "page_param", "last_page_rule"), "host", "left"
        )
        # last-page read: per-site rule over the raw pagination labels —
        # teanadin-style blocks end with a next-arrow, so the number is
        # the SECOND-to-last label (teanadin.rs:95-99 `.rev().nth(1)`);
        # everyone else reads the last label. Unparseable/absent -> 1.
        lp_label = F.when(
            F.col("last_page_rule") == "second_last",
            F.expr("try_element_at(page_labels, -2)"),
        ).otherwise(F.expr("try_element_at(page_labels, -1)"))
        cat = cat.withColumn(
            "_last_eff", F.coalesce(lp_label.try_cast("int"), F.lit(1))
        )
        # pagination synthesis (F2): strip any existing page param, append new
        page_links = (
            cat.filter(F.col("_last_eff") >= 2)
            .select(
                "url_hash", "ord", "url", "page_param", "_last_eff",
                F.explode(F.sequence(F.lit(2), F.col("_last_eff"))).alias("page_no"),
            )
            .withColumn("_stripped", F.regexp_replace(
                F.col("url"),
                F.concat(F.lit("[?&]"), F.col("page_param"), F.lit("=\\d+")),
                "",
            ))
            .withColumn(
                "child_url",
                F.concat(
                    F.col("_stripped"),
                    F.when(F.col("_stripped").contains("?"), F.lit("&")).otherwise(F.lit("?")),
                    F.col("page_param"), F.lit("="), F.col("page_no").cast("string"),
                ),
            )
            .withColumn("child_depth", F.lit(2))
            .withColumn("child_ord", F.concat("ord", hseg_col(F.col("page_no") - 1)))
            .select("url_hash", "ord", F.lit(0).alias("pos"), "child_url", "child_depth", "child_ord")
        )
        cat_product_links = (
            ok.filter(F.col("kind") == "category")
            .select("url_hash", "ord", F.posexplode("out_links").alias("pos", "child_url"))
            .withColumn("child_depth", F.lit(3))
            .withColumn("child_ord", F.concat("ord", hseg_col(F.lit(0)), hseg_col(F.col("pos"))))
        )
        listing_links = (
            ok.filter(F.col("kind") == "listing")
            .select("url_hash", "ord", F.posexplode("out_links").alias("pos", "child_url"))
            .withColumn("child_depth", F.lit(3))
            .withColumn("child_ord", F.concat("ord", hseg_col(F.col("pos"))))
        )
        all_links = seed_links.unionByName(page_links).unionByName(
            cat_product_links
        ).unionByName(listing_links)
        return (
            all_links.withColumn("url", canonicalize_url_udf(F.col("child_url")))
            .withColumn("host", host_of(F.col("url")))
            .select(
                F.xxhash64("url").alias("url_hash"),
                "url", "host",
                F.col("child_depth").alias("depth"),
                F.col("child_ord").alias("ord"),
                F.col("url_hash").alias("parent_hash"),
            )
        )

    def _build_lineage(
        self, round_no, scheduled, fetched, discovered_by_host, allowed,
        robots_rejected, results_new, rejects_val,
    ) -> DataFrame:
        sched = scheduled.groupBy("host").agg(F.count("*").alias("scheduled"))
        fet = fetched.groupBy("host").agg(
            F.sum(F.when(F.col("ok"), 1).otherwise(0)).alias("fetched"),
            F.sum(F.when(F.col("ok"), 0).otherwise(1)).alias("fetch_errors"),
        )
        new = allowed.groupBy("host").agg(F.count("*").alias("links_new"))
        rob = robots_rejected.groupBy("host").agg(F.count("*").alias("robots_rejected"))
        resr = results_new.groupBy("host").agg(F.count("*").alias("results_rows"))
        rej = rejects_val.groupBy("host").agg(F.count("*").alias("reject_rows"))
        out = (
            sched.join(fet, "host", "left")
            .join(discovered_by_host, "host", "left")
            .join(new, "host", "left")
            .join(rob, "host", "left")
            .join(resr, "host", "left")
            .join(rej, "host", "left")
            .na.fill(0)
        )
        return out.select(
            F.lit(self.run_id).alias("run_id"),
            F.lit(round_no).alias("round"),
            "host",
            F.col("scheduled").cast("long"),
            F.col("fetched").cast("long"),
            F.col("fetch_errors").cast("long"),
            F.col("links_discovered").cast("long"),
            F.col("links_new").cast("long"),
            (F.col("links_discovered") - F.col("links_new") - F.col("robots_rejected"))
            .cast("long").alias("links_dup"),
            F.col("robots_rejected").cast("long"),
            F.col("results_rows").cast("long"),
            F.col("reject_rows").cast("long"),
        )
