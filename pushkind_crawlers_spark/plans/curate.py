"""Corpus-curation job: the flagship LLM-training-data pipeline as a
store-committed run (VERDICT r03 missing/next #9).

Composes the engine's already-plan-audited operators end-to-end —

    documents ──quality/token filter (JVM col exprs)──>
              ──MinHash-LSH candidates ──exact-Jaccard confirm──>
              ──connected-components clusters──>
              ──one representative per cluster + features──>
              ──atomic snapshot commit (``corpus_reps``)──

— the same chain as ``queries.corpus_curation`` (oracle-paired against
a recursive-CTE DuckDB twin), but parameterized and writing through the
snapshot store so a curation run is resumable/rollbackable like any
crawl round. At 100 TB every stage keeps its audited shape: no
all-pairs joins (LSH-bucketed candidates), map-side shingle hashing,
checkpointed label propagation with loud convergence failure.

Reference framing: the reference has no curation job — this is the
"beyond the reference" training-data surface (round brief); its closest
analog is the benchmark job's read->compute->commit shape
(/root/reference/src/processing/benchmark.rs:52-117).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import text as X
from ..operators import dedup as D
from ..store.ops import RunLock
from ..store.snapshots import SnapshotStore

CORPUS_REPS = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("cluster_size", T.LongType(), False),
    T.StructField("n_tokens", T.LongType(), False),
    T.StructField("quality", T.DoubleType(), False),
])


def run_corpus_curation(
    spark: SparkSession,
    store: SnapshotStore,
    docs: DataFrame,
    min_tokens: int = 8,
    min_quality: float = 0.3,
    threshold: float = 0.2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> dict:
    """Filter -> near-dup cluster -> representatives, committed atomically
    to the store's ``corpus_reps`` table. Returns run stats."""
    with RunLock(store, scope="curate"):
        docs = docs.select(
            F.col(id_col).cast("long").alias("doc_id"),
            F.col(text_col).alias("text"),
        )
        n_docs = docs.count()
        filt = docs.filter(
            (X.token_count_col(F.col("text")) >= min_tokens)
            & (X.quality_score_col(F.col("text")) >= min_quality)
        ).select("doc_id", "text")
        clusters = D.dedup_clusters(filt, threshold=threshold)
        feats = filt.select(
            "doc_id",
            X.token_count_col(F.col("text")).cast("long").alias("n_tokens"),
            X.quality_score_col(F.col("text")).alias("quality"),
        )
        reps = (
            clusters.filter(F.col("is_rep"))
            .join(feats, "doc_id")
            .select("doc_id", "cluster_size", "n_tokens", "quality")
        )
        t = store.table("corpus_reps", CORPUS_REPS)
        t.commit(reps)
        out = t.read(spark)
        n_reps = out.count()
        n_kept = filt.count()
        return {
            "docs_in": n_docs,
            "docs_after_filter": n_kept,
            "representatives": n_reps,
            "near_dup_removed": n_kept - n_reps,
            "snapshot_id": t.current_snapshot_id(),
        }
