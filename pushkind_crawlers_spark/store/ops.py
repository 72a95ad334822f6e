"""Persistence parity operators over snapshot tables (SURVEY.md §2.3/2.4).

Each operator re-expresses one of the reference's Diesel repository
methods as a declarative DataFrame transform committed through the
snapshot store. On a cluster with an Iceberg runtime these become literal
``MERGE INTO`` / ``DELETE FROM`` statements; the semantics here are
identical and exercised hermetically.

Reference anchors (in /root/reference):
* merge_upsert        <- update_products ON CONFLICT(crawler_id,url)
                         (src/repository/product.rs:116-143)
* cascade_delete      <- delete_products 3-table cascade
                         (src/repository/product.rs:164-192)
* replace_children    <- replace_product_images delete-then-insert
                         (src/repository/product.rs:18-45)
* set_embeddings      <- set_product_embedding point updates
                         (src/repository/product.rs:145-162)
* update_stats        <- update_crawler_stats count+flags+timestamp
                         (src/repository/crawler.rs:41-63)
* assign_categories_guarded <- set_product_category_automatic, never
                         overwriting manual rows
                         (src/repository/category.rs:54-79)
* RunLock             <- processing flags + hub lock claimed in an
                         immediate_transaction
                         (src/repository/crawler.rs:65-79,
                          src/repository/category.rs:135-191)

Scale notes: every merge shuffles on the natural key only; the "batch"
side is the small side and is broadcast; the base side streams. The
manual-source guard is a join-time predicate, not a post-hoc filter, so
the merge writes only rows it may legally touch.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .snapshots import SnapshotStore, SnapshotTable


def list_products(results: DataFrame, images: DataFrame,
                  crawler_id: int | None = None) -> DataFrame:
    """P1: filter scan + child-image fetch + group-by-product assembly
    (product.rs:48-87): one row per product with its images collected in
    image_id order (the reference returns them grouped per product)."""
    r = results if crawler_id is None else results.filter(
        F.col("crawler_id") == crawler_id
    )
    exploded = r.select("url", F.explode_outer("image_ids").alias("image_id"))
    with_imgs = exploded.join(images, "image_id", "left")
    assembled = with_imgs.groupBy("url").agg(
        F.array_sort(
            F.collect_list(F.struct("image_id", "bytes", "caption"))
        ).alias("product_images")
    )
    return r.drop("image_ids").join(assembled, "url", "left")


def hub_crawlers(spark: SparkSession, store: SnapshotStore,
                 hub_id: int | None) -> DataFrame | None:
    """P7: ``list_crawlers(hub_id)`` (crawler.rs:21-37) as the hub-scope
    dimension — a broadcastable (crawler_id) frame, or None when no hub
    scoping is requested (single-hub store, the engine's default)."""
    if hub_id is None:
        return None
    from .. import schemas

    crawlers = store.table("crawlers", schemas.CRAWLERS).read(spark)
    return F.broadcast(
        crawlers.filter(F.col("hub_id") == hub_id).select("crawler_id")
    )


def merge_upsert(base: DataFrame, batch: DataFrame, keys: list[str],
                 update_cols: list[str] | None = None) -> DataFrame:
    """MERGE: matched rows take the batch's values, unmatched batch rows
    insert, untouched base rows pass through (product.rs:129-135).

    ``update_cols``: columns the batch overwrites; all others keep the
    base value on matched rows. Batch must be key-unique.

    Scale note: the join is a plain shuffle-on-key full_outer — Spark
    cannot build a broadcast-hash join for full_outer, so a broadcast
    hint would either be ignored or degrade to BroadcastNestedLoopJoin;
    with a crawl-round-sized batch (every round's results) that would be
    a scale-killer. The shuffle is on the merge key only.
    """
    cols = base.columns
    update_cols = update_cols or [c for c in batch.columns if c not in keys]
    b = batch.select(
        *[F.col(k).alias(f"_k_{k}") for k in keys],
        *[F.col(c).alias(f"_v_{c}") for c in update_cols],
        F.lit(True).alias("_matched"),
    )
    cond = [F.col(k) == F.col(f"_k_{k}") for k in keys]
    joined = base.join(b, cond, "full_outer")
    out_cols = []
    for c in cols:
        if c in keys:
            out_cols.append(F.coalesce(F.col(c), F.col(f"_k_{c}")).alias(c))
        elif c in update_cols:
            out_cols.append(
                F.when(F.col("_matched").isNotNull(), F.col(f"_v_{c}"))
                .otherwise(F.col(c)).alias(c)
            )
        else:
            out_cols.append(F.col(c).alias(c))
    return joined.select(*out_cols)


def cascade_delete(results: DataFrame, images: DataFrame,
                   associations: DataFrame | None, crawler_id: int,
                   ) -> tuple[DataFrame, DataFrame, DataFrame | None]:
    """P5: delete a crawler's products + child images + associations
    (product.rs:164-192). Children resolve through the parent's image_ids
    — the Spark analog of the id-list semi-join."""
    doomed = results.filter(F.col("crawler_id") == crawler_id)
    kept_results = results.filter(F.col("crawler_id") != crawler_id)
    doomed_images = doomed.select(F.explode("image_ids").alias("image_id")).distinct()
    kept_images = images.join(doomed_images, "image_id", "left_anti")
    kept_assoc = None
    if associations is not None:
        kept_assoc = associations.join(
            doomed.select(F.col("url").alias("product_url")).distinct(),
            "product_url", "left_anti",
        )
    return kept_results, kept_images, kept_assoc


def replace_children(images: DataFrame, parent_results: DataFrame,
                     new_images: DataFrame) -> DataFrame:
    """P4: replace-all child rows for the given parents (delete-then-insert,
    product.rs:18-45) as one declarative overwrite."""
    parent_img_ids = parent_results.select(
        F.explode("image_ids").alias("image_id")
    ).distinct()
    survivors = images.join(parent_img_ids, "image_id", "left_anti")
    return survivors.unionByName(new_images)


def set_embeddings(results: DataFrame, embeddings: DataFrame) -> DataFrame:
    """P6/E3: point-update the embedding column for the given urls; other
    rows untouched (product.rs:145-162). ``embeddings``: (url, embedding)."""
    e = embeddings.select("url", F.col("embedding").alias("_new_emb"))
    return (
        results.join(F.broadcast(e), "url", "left")
        .withColumn("embedding", F.coalesce(F.col("_new_emb"), F.col("embedding")))
        .drop("_new_emb")
    )


def update_stats(results: DataFrame) -> DataFrame:
    """P8: per-crawler COUNT(*) + freshest round (crawler.rs:41-63)."""
    return results.groupBy("crawler_id").agg(
        F.count("*").alias("num_products"),
        F.max("round").alias("last_round"),
    )


def assign_categories_guarded(results: DataFrame, assignments: DataFrame) -> DataFrame:
    """P12: apply automatic category assignments, never overwriting rows
    whose category_assignment_source == 'manual' (category.rs:54-79).

    ``assignments``: (url, category_id). Applied rows get source
    'automatic'."""
    a = F.broadcast(assignments.select("url", F.col("category_id").alias("_new_cat")))
    guarded = (
        F.col("_new_cat").isNotNull()
        & (F.coalesce(F.col("category_assignment_source"), F.lit("")) != "manual")
    )
    return (
        results.join(a, "url", "left")
        .withColumn(
            "category_id",
            F.when(guarded, F.col("_new_cat")).otherwise(F.col("category_id")),
        )
        .withColumn(
            "category_assignment_source",
            F.when(guarded, F.lit("automatic"))
            .otherwise(F.col("category_assignment_source")),
        )
        .drop("_new_cat")
    )


def clear_categories_guarded(results: DataFrame, crawler_id: int) -> DataFrame:
    """P13: NULL-out automatic assignments for one crawler, preserving
    manual rows (category.rs:81-105)."""
    hit = (
        (F.col("crawler_id") == crawler_id)
        & (F.coalesce(F.col("category_assignment_source"), F.lit("")) != "manual")
    )
    return results.withColumn(
        "category_id", F.when(hit, F.lit(None)).otherwise(F.col("category_id"))
    ).withColumn(
        "category_assignment_source",
        F.when(hit, F.lit(None)).otherwise(F.col("category_assignment_source")),
    )


# ------------------------------------------------------------------ G1-G3

class RunLockError(RuntimeError):
    pass


class RunLock:
    """Single-writer run lock (G1/G2): the reference's processing flags +
    hub lock (category.rs:135-191), as an atomically-claimed lock file
    next to the store's run manifest.

    Claim = exclusive create (O_EXCL, the filesystem analog of SQLite's
    immediate_transaction check-and-set). Release happens in ``finally``
    even on failure — fixing the reference's flag-leak-on-early-return
    (SPEC.md:353). Stale locks (older than ``ttl_s``) are breakable,
    mirroring how a new Iceberg commit supersedes a dead writer.
    """

    def __init__(self, store: SnapshotStore, scope: str = "hub", ttl_s: float = 3600.0):
        self.path = os.path.join(store.root, f"_lock-{scope}.json")
        self.ttl_s = ttl_s
        self.token = uuid.uuid4().hex

    def is_locked(self) -> bool:
        try:
            with open(self.path) as f:
                meta = json.load(f)
        except (FileNotFoundError, json.JSONDecodeError):
            return False
        return (time.time() - meta["claimed_at"]) < self.ttl_s

    def claim(self) -> None:
        if self.is_locked():
            raise RunLockError("another run holds the lock (processing=true)")
        try:
            os.remove(self.path)  # break a stale lock
        except FileNotFoundError:
            pass
        fd = os.open(self.path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        with os.fdopen(fd, "w") as f:
            json.dump({"token": self.token, "claimed_at": time.time()}, f)

    def release(self) -> None:
        try:
            with open(self.path) as f:
                if json.load(f).get("token") != self.token:
                    return  # not ours — never release someone else's claim
            os.remove(self.path)
        except (FileNotFoundError, json.JSONDecodeError):
            pass

    def __enter__(self) -> "RunLock":
        self.claim()
        return self

    def __exit__(self, *exc) -> None:
        self.release()
