"""Similarity search + embedding analytics tail (SURVEY.md §2.5, E1-E7).

Reference semantics re-expressed Spark-first:
* E1/E2: embedder + L2 normalization
  (/root/reference/src/processing/embedding.rs:28-35) — here a
  deterministic feature-hash embedder in a vectorized ``pandas_udf``
  (the fastembed E5 model cannot be downloaded offline; production swaps
  the UDF body, the plan stays identical).
* E3 memoized fill (/root/reference/src/processing/embedding.rs:41-65):
  embed ONLY rows with NULL embedding (anti-join pattern), union back —
  incremental compute.
* E4 top-k (/root/reference/src/processing/embedding.rs:68-105): the
  reference builds an in-memory usearch HNSW; at Spark scale the exact
  top-k is a broadcast query vector + JVM dot product + window/order —
  no index build, one pass. The approximate scale path is
  random-hyperplane LSH bucketing (`ann_lsh_topk`): candidates only from
  matching buckets (multi-probe by Hamming-adjacent buckets).
* E5 threshold sim >= 0.8 (/root/reference/src/lib.rs:7).
* E6 benchmark top-10 association
  (/root/reference/src/processing/benchmark.rs:112-192).
* E7 category top-1 assignment
  (/root/reference/src/processing/category.rs:170-221) — broadcast the
  small side, argmax per product via window.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .dedup import dot_col

SIM_THRESHOLD = 0.8  # reference src/lib.rs:7
EMBED_DIM = 64


# ----------------------------------------------------------- E1/E2 embedder

def _hash_encode_series(texts: pd.Series, dim: int) -> pd.Series:
    """The deterministic feature-hash encoder core (shared by the gate
    UDF and the auto UDF's fallback so both paths are bit-identical):
    token -> bucket = md5(token) % dim, sign from next md5 bit; the bag
    of signed token counts is L2-normalized (zero vectors pass through,
    embedding.rs:28-35)."""
    import hashlib

    out = []
    for t in texts:
        vec = np.zeros(dim, dtype=np.float64)
        if t:
            toks = [x for x in t.split(" ") if x]
            if toks:
                digests = np.frombuffer(
                    b"".join(hashlib.md5(x.encode()).digest()[:8] for x in toks),
                    dtype=np.uint64,
                )
                buckets = (digests % dim).astype(np.int64)
                signs = np.where((digests >> np.uint64(32)) & np.uint64(1), 1.0, -1.0)
                np.add.at(vec, buckets, signs)
        n = float(np.linalg.norm(vec))
        if n > 0.0:
            vec = vec / n
        out.append(vec.astype(np.float32))
    return pd.Series(out)


def hash_embed_udf(dim: int = EMBED_DIM):
    """Deterministic feature-hash embedder, L2-normalized, Arrow-batched.

    Vectorized over the batch: one numpy matrix per Arrow batch, no
    per-row Python beyond the tokenizer split. This is the ORACLE path —
    its output is pinned bit-exact by the ``embed_fill`` gate's md5-LE
    SQL twin; production jobs use :func:`auto_embed_udf`, which resolves
    to the same math when no real model is installed.
    """

    @F.pandas_udf(T.ArrayType(T.FloatType()))
    def embed(texts: pd.Series) -> pd.Series:
        return _hash_encode_series(texts, dim)

    return embed


# --- production-encoder runtime probe (VERDICT r03 missing #4) -----------
# Same shape as the real-codec probe (multimodal.py real_image_decoder):
# resolved lazily ONCE per python worker process. A real sentence
# encoder (fastembed, then sentence-transformers — the reference inits
# fastembed's TextEmbedding once and reuses it, src/processing/
# benchmark.rs:60-67) is used when importable; otherwise the
# deterministic hash encoder keeps every oracle gate bit-identical.

_text_encoder: object = False  # False = not probed; None = probed, absent


def real_text_encoder():
    """A callable ``list[str] -> [n, d] float32 L2-normalized ndarray``
    backed by a real model when importable, else None. Probed once per
    process; the model handle is captured in the closure so repeated
    calls never re-load weights."""
    global _text_encoder
    if _text_encoder is False:
        _text_encoder = None
        try:
            from fastembed import TextEmbedding  # reference's encoder

            model = TextEmbedding()

            def _fe(texts: list[str]) -> np.ndarray:
                return np.stack(
                    [np.asarray(v, dtype=np.float32) for v in model.embed(texts)]
                )

            _text_encoder = _fe
        except ImportError:
            try:
                from sentence_transformers import SentenceTransformer

                model = SentenceTransformer("all-MiniLM-L6-v2")

                def _st(texts: list[str]) -> np.ndarray:
                    return model.encode(
                        texts, normalize_embeddings=True
                    ).astype(np.float32)

                _text_encoder = _st
            except ImportError:
                pass
    return _text_encoder


def set_text_encoder(fn) -> None:
    """Inject/override the production encoder (None = force hash
    fallback; :func:`reset_text_encoder` re-probes). NOTE: workers probe
    independently — in local mode the injection reaches them through the
    UDF closure only if set BEFORE the UDF is created; tests inject a
    factory via :func:`auto_embed_udf`'s ``encoder_factory`` instead."""
    global _text_encoder
    _text_encoder = fn


def reset_text_encoder() -> None:
    global _text_encoder
    _text_encoder = False


def auto_embed_udf(dim: int = EMBED_DIM, encoder_factory=real_text_encoder):
    """Production E1: iterator-form pandas UDF so the encoder is
    resolved ONCE per task/partition (the canonical load-model-once
    shape), then reused across every Arrow batch of that partition.
    Falls back to the bit-exact hash encoder when no model is
    importable, so offline runs and oracle gates are unchanged.

    ``encoder_factory``: zero-arg factory resolved inside the worker —
    tests inject a counting fake to prove once-per-partition init.
    """

    @F.pandas_udf(T.ArrayType(T.FloatType()))
    def embed(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        enc = encoder_factory()  # once per partition, never per batch
        for texts in batches:
            if enc is None:
                yield _hash_encode_series(texts, dim)
            else:
                filled = ["" if t is None else t for t in texts]
                mat = enc(filled)
                norms = np.linalg.norm(mat, axis=1, keepdims=True)
                mat = np.where(norms > 0.0, mat / np.maximum(norms, 1e-12), mat)
                yield pd.Series(list(mat.astype(np.float32)))

    return embed


def fill_missing_embeddings(df: DataFrame, text_col: str = "prompt",
                            emb_col: str = "embedding", dim: int = EMBED_DIM) -> DataFrame:
    """E3: embed only rows where the embedding is NULL, union back."""
    have = df.filter(F.col(emb_col).isNotNull())
    missing = df.filter(F.col(emb_col).isNull())
    embed = hash_embed_udf(dim)
    filled = missing.withColumn(emb_col, embed(F.col(text_col)))
    return have.unionByName(filled)


def prompt_col(name: Column, sku: Column, category: Column, units: Column,
               price: Column, amount: Column, description: Column) -> Column:
    """S7 prompt template — golden-tested against
    /root/reference/src/processing/benchmark.rs:198-212."""
    return F.concat_ws(
        "\n",
        F.concat(F.lit("Name: "), F.coalesce(name, F.lit(""))),
        F.concat(F.lit("SKU: "), F.coalesce(sku, F.lit(""))),
        F.concat(F.lit("Category: "), F.coalesce(category, F.lit(""))),
        F.concat(F.lit("Units: "), F.coalesce(units, F.lit(""))),
        F.concat(F.lit("Price: "), F.coalesce(price.cast("string"), F.lit(""))),
        F.concat(F.lit("Amount: "), F.coalesce(amount.cast("string"), F.lit(""))),
        F.concat(F.lit("Description: "), F.coalesce(description, F.lit(""))),
    )


# ----------------------------------------------------------------- E4 top-k

def brute_force_topk(emb: DataFrame, query_vec: list[float], k: int = 10,
                     id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact cosine top-k vs one query vector (assumed L2-normalized).

    The query is a literal array (broadcast by constant folding); the dot
    product is JVM codegen; ordering ties break on id for determinism.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = emb.select(
        F.col(id_col).alias("vec_id"),
        F.round(dot_col(F.col(vec_col), q), 4).alias("cosine"),
    )
    # distributed top-k: orderBy+limit plans as TakeOrdered (per-partition
    # top-k then a k-row merge) — never a global single-reducer window
    top = scored.orderBy(F.desc("cosine"), F.asc("vec_id")).limit(k)
    w = Window.orderBy(F.desc("cosine"), F.asc("vec_id"))  # over k rows only
    return (
        top.withColumn("rank", F.row_number().over(w))
        .select("vec_id", "cosine", "rank")
    )


def topk_per_group(emb: DataFrame, queries: DataFrame, k: int = 10,
                   group_col: str = "label",
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   q_id: str = "q_id", q_vec: str = "q_vec") -> DataFrame:
    """E6 shape: top-k items per query, query side broadcast."""
    joined = emb.crossJoin(F.broadcast(queries.select(q_id, q_vec)))
    scored = joined.select(
        F.col(q_id), F.col(id_col),
        F.round(dot_col(F.col(vec_col), F.col(q_vec)), 4).alias("cosine"),
    )
    w = Window.partitionBy(q_id).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


# ------------------------------------------------------------ ANN scale path

def hyperplanes(dim: int, n_planes: int, seed: int = 7) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).astype(np.float64)


def lsh_bucket_udf(planes: np.ndarray):
    """Random-hyperplane signature (int bucket) — vectorized Arrow UDF.

    One matmul per Arrow batch: (batch × dim) @ (dim × planes) -> sign
    bits packed into an int64 bucket id.
    """
    p = planes.T.copy()  # dim x n_planes
    weights = (1 << np.arange(planes.shape[0], dtype=np.int64))

    @F.pandas_udf(T.LongType())
    def bucket(vecs: pd.Series) -> pd.Series:
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        signs = (mat @ p) > 0.0
        return pd.Series((signs @ weights).astype(np.int64))

    return bucket


def ann_lsh_topk(emb: DataFrame, query_vec: list[float], k: int = 10,
                 n_planes: int = 8, seed: int = 7, multiprobe: int = 1,
                 id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k: hyperplane-LSH bucket the corpus, score only the
    query's bucket (± multi-probe Hamming-1 neighbors).

    At 100 TB the bucket column is precomputed and the table is
    partitioned by it — the query then touches only matching partitions
    (partition pruning) instead of a full scan.

    Recall caveat (measured, BENCH.md "ANN recall@10": 0.06-0.65 on a
    100k clustered corpus): a SINGLE hyperplane table is a blocking
    structure, not a top-k structure — keep ``multiprobe>=1``, and for
    recall-critical top-k prefer :func:`ann_ivf_topk`, which reaches
    recall 1.0 at ~4% scan on the same corpus.
    """
    q = np.asarray(query_vec, dtype=np.float64)
    planes = hyperplanes(len(query_vec), n_planes, seed)
    qsig = int(((planes @ q) > 0.0) @ (1 << np.arange(n_planes, dtype=np.int64)))
    probes = [qsig]
    if multiprobe >= 1:
        probes += [qsig ^ (1 << i) for i in range(n_planes)]
    bucket = lsh_bucket_udf(planes)
    bucketed = emb.withColumn("bucket", bucket(F.col(vec_col)))
    cand = bucketed.filter(F.col("bucket").isin(probes))
    qcol = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = cand.select(
        F.col(id_col).alias("vec_id"),
        F.round(dot_col(F.col(vec_col), qcol), 4).alias("cosine"),
    )
    top = scored.orderBy(F.desc("cosine"), F.asc("vec_id")).limit(k)
    w = Window.orderBy(F.desc("cosine"), F.asc("vec_id"))  # over k rows only
    return (
        top.withColumn("rank", F.row_number().over(w))
        .select("vec_id", "cosine", "rank")
    )


def kmeans_fit(sample: np.ndarray, n_centroids: int, iters: int = 12,
               seed: int = 11) -> np.ndarray:
    """Tiny deterministic Lloyd's k-means on a driver-side sample — the
    standard IVF training regime (train on a sample, assign distributed).
    Pure numpy; k and sample are small by design."""
    rng = np.random.default_rng(seed)
    n = sample.shape[0]
    cents = sample[rng.choice(n, size=min(n_centroids, n), replace=False)].copy()
    for _ in range(iters):
        d = ((sample[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(cents.shape[0]):
            mask = assign == c
            if mask.any():
                cents[c] = sample[mask].mean(axis=0)
    return cents


def ivf_assign_udf(centroids: np.ndarray):
    """Nearest-centroid id per vector — one matmul per Arrow batch."""
    cents = centroids.astype(np.float64)

    @F.pandas_udf(T.IntegerType())
    def assign(vecs: pd.Series) -> pd.Series:
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        # argmin ||x-c||^2 == argmax (x.c - ||c||^2/2)
        scores = mat @ cents.T - 0.5 * (cents ** 2).sum(axis=1)[None, :]
        return pd.Series(scores.argmax(axis=1).astype(np.int32))

    return assign


def ann_ivf_topk(emb: DataFrame, query_vec: list[float], k: int = 10,
                 n_centroids: int = 16, n_probe: int = 3,
                 sample_n: int = 2048, seed: int = 11,
                 id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """IVF ANN: k-means buckets trained on a sample, corpus assigned via a
    vectorized UDF, only the query's n_probe nearest buckets scored.

    At 100 TB the centroid column is precomputed and the table partitioned
    by it — a query prunes to n_probe/n_centroids of the data before any
    scan (partition pruning), which is IVF's entire point.  Measured
    recall (BENCH.md "ANN recall@10", 100k clustered corpus): recall 1.0
    from n_probe=1 of 64 centroids (~2% scanned) — the recommended
    top-k scale path; sized like the reference's recall-tuned usearch
    defaults (src/processing/embedding.rs:82-89).

    The training sample is the first ``sample_n`` rows by id (TakeOrdered
    — a bounded, DETERMINISTIC collect; a bare limit() samples whatever
    partition answers first, which breaks run-to-run reproducibility).
    With ``n_probe == n_centroids`` the result provably equals the exact
    top-k (partition completeness) — that exactness is the driver-gate
    check; the recall bound for partial probing is pytest-asserted.
    """
    sample_rows = (
        emb.select(id_col, vec_col).orderBy(id_col).limit(sample_n).collect()
    )
    sample = np.stack([np.asarray(r[1], dtype=np.float64) for r in sample_rows])
    cents = kmeans_fit(sample, n_centroids, seed=seed)
    q = np.asarray(query_vec, dtype=np.float64)
    probe_ids = np.argsort(((cents - q[None, :]) ** 2).sum(axis=1))[:n_probe]
    assign = ivf_assign_udf(cents)
    bucketed = emb.withColumn("_cent", assign(F.col(vec_col)))
    cand = bucketed.filter(F.col("_cent").isin([int(c) for c in probe_ids]))
    qcol = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = cand.select(
        F.col(id_col).alias("vec_id"),
        F.round(dot_col(F.col(vec_col), qcol), 4).alias("cosine"),
    )
    top = scored.orderBy(F.desc("cosine"), F.asc("vec_id")).limit(k)
    w = Window.orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        top.withColumn("rank", F.row_number().over(w))
        .select("vec_id", "cosine", "rank")
    )


# -------------------------------------------------- E6/E7 association jobs

def benchmark_topk_association(products: DataFrame, benchmark_vec: list[float],
                               k: int = 10, threshold: float = SIM_THRESHOLD,
                               group_col: str = "crawler_id") -> DataFrame:
    """E6: per crawler, top-10 products by cosine vs the benchmark vector,
    thresholded at 0.8 (benchmark.rs:158-191). Expects `embedding` column."""
    q = F.array(*[F.lit(float(x)) for x in benchmark_vec])
    scored = products.select(
        group_col, "url",
        F.round(dot_col(F.col("embedding"), q), 4).alias("sim"),
    )
    w = Window.partitionBy(group_col).orderBy(F.desc("sim"), F.asc("url"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter((F.col("rank") <= k) & (F.col("sim") >= threshold))
    )


def category_top1_assignment(products: DataFrame, categories: DataFrame,
                             threshold: float = SIM_THRESHOLD) -> DataFrame:
    """E7: broadcast the category matrix, argmax per product, threshold.

    products: (url, embedding); categories: (category_id, embedding).
    Returns (url, category_id, sim) for assignments passing the 0.8 bar;
    the conditional MERGE (never overwrite manual) lives in store.ops.
    """
    cats = F.broadcast(
        categories.select(
            F.col("category_id"), F.col("embedding").alias("cat_vec")
        )
    )
    scored = products.crossJoin(cats).select(
        "url", "category_id",
        F.round(dot_col(F.col("embedding"), F.col("cat_vec")), 4).alias("sim"),
    )
    w = Window.partitionBy("url").orderBy(F.desc("sim"), F.asc("category_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter((F.col("rank") == 1) & (F.col("sim") >= threshold))
        .select("url", "category_id", "sim")
    )
