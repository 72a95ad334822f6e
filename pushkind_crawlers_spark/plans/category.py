"""E7: hub-wide product -> category top-1 assignment, composed end-to-end.

Reference flow (/root/reference/src/processing/category.rs:259-309 message
path; :33-224 job): claim the hub-wide lock atomically -> load every
crawler's products -> load categories -> memoized category embeddings
(prompt = category NAME only, category.rs:16-18) -> per-product memoized
embedding -> top-1 cosine vs the category matrix -> sim >= 0.8 threshold ->
conditional persist that NEVER overwrites manual assignments
(category.rs:54-79) -> stats counters (matched / unmatched / skipped,
category.rs:20-31) -> lock release in a finalizer even on failure
(category.rs:246-255).

Spark shape — one job through the snapshot store:

    results ──prompt (S7)──> fill_missing_embeddings (E3) ──P6 commit──>
    categories ──name-prompt E3 fill──> broadcast category matrix ──>
    cross-join argmax per product (E7 window) ──threshold (E5)──>
    assign_categories_guarded MERGE (P12: manual rows untouched) ──>
    results commit + stats

At 100 TB: the category matrix is tiny and broadcast; the per-product
argmax is one window over data shuffled by url; the guarded merge writes
only rows it may legally touch (join-time predicate, not post-hoc).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import schemas
from ..operators.similarity import (
    SIM_THRESHOLD,
    category_top1_assignment,
    fill_missing_embeddings,
    auto_embed_udf,
    prompt_col,
)
from ..store.ops import (RunLock, assign_categories_guarded, hub_crawlers,
                         set_embeddings)
from ..store.snapshots import SnapshotStore


def run_category_match(
    spark: SparkSession,
    store: SnapshotStore,
    categories: DataFrame,
    threshold: float = SIM_THRESHOLD,
    hub_id: int | None = None,
) -> dict:
    """One full E7 job against the store; returns the reference's stats
    counters. ``categories``: (category_id int, name string,
    embedding array<float> nullable).

    ``hub_id`` scopes the whole job — lock, embedding fill, assignment,
    stats — to that hub's crawlers (the reference's hub-wide lock +
    list_crawlers, category.rs:109-171); other hubs' rows are never
    touched and other hubs can run concurrently. None = whole store."""
    with RunLock(store, scope="hub" if hub_id is None else f"hub-{hub_id}"):
        results_t = store.table("results", schemas.RESULTS)
        results_t.set_bucket_spec(["url"])
        results = results_t.read(spark)
        hub = hub_crawlers(spark, store, hub_id)
        scoped = results if hub is None else results.join(hub, "crawler_id", "semi")
        n_missing = scoped.filter(F.col("embedding").isNull()).count()

        prompts = scoped.withColumn(
            "prompt",
            prompt_col(
                F.col("name"), F.col("sku"), F.col("category"), F.col("units"),
                F.col("price"), F.col("amount"), F.col("description"),
            ),
        )
        # E3 fill as a bucket-scoped MERGE: only buckets holding the
        # hub's embedding-null urls rewrite (O(delta), CAS-retried), so
        # two hubs' concurrent jobs can no longer silently revert each
        # other's whole-table snapshots (r3 ADVICE high)
        embed = auto_embed_udf()
        new_embs = prompts.filter(F.col("embedding").isNull()).select(
            "url", embed(F.col("prompt")).alias("embedding")
        )
        results_t.merge_commit(spark, new_embs, set_embeddings)
        products_all = results_t.read(spark)
        products = (products_all if hub is None
                    else products_all.join(hub, "crawler_id", "semi"))

        # category embeddings: prompt is the NAME alone (category.rs:16-18)
        cats = fill_missing_embeddings(
            categories.withColumn("prompt", F.col("name"))
        ).drop("prompt").select("category_id", "embedding")

        assignment = category_top1_assignment(
            products.select("url", "embedding"), cats, threshold=threshold
        ).select("url", "category_id")

        # P12 guarded assignment as a bucket-scoped MERGE: assignments
        # only name hub urls, so only their buckets rewrite; non-hub rows
        # and manual rows pass through bit-for-bit (the guard is the
        # join-time predicate inside assign_categories_guarded)
        results_t.merge_commit(spark, assignment, assign_categories_guarded)
        out = results_t.read(spark)
        if hub is not None:
            out = out.join(hub, "crawler_id", "semi")

        # stats counters (category.rs:20-31), hub-scoped when requested
        agg = out.agg(
            F.count(F.lit(1)).alias("total"),
            F.sum(F.when(F.col("category_assignment_source") == "automatic", 1)
                  .otherwise(0)).alias("automatic"),
            F.sum(F.when(F.col("category_assignment_source") == "manual", 1)
                  .otherwise(0)).alias("manual_kept"),
            F.sum(F.when(F.col("category_id").isNull(), 1)
                  .otherwise(0)).alias("unassigned"),
        ).first()
        return {
            "total": agg["total"],
            "matched_automatic": agg["automatic"],
            "manual_kept": agg["manual_kept"],
            "unmatched": agg["unassigned"],
            "embedded": int(n_missing),
        }
