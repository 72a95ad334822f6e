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
    hash_embed_udf,
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
        if hub is None:
            filled = fill_missing_embeddings(prompts).drop("prompt")
            results_t.commit(filled)
        else:
            embed = hash_embed_udf()
            new_embs = prompts.filter(F.col("embedding").isNull()).select(
                "url", embed(F.col("prompt")).alias("embedding")
            )
            results_t.commit(set_embeddings(results, new_embs))
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

        # the merge runs over the FULL table but assignments only name
        # hub urls, so non-hub rows pass through bit-for-bit
        merged = assign_categories_guarded(products_all, assignment)
        results_t.commit(merged)
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
