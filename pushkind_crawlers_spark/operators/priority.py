"""Frontier priority scoring — vectorized Arrow UDFs (north rule).

``priority = -w_depth * depth + w_novelty * novelty - w_budget *
budget_pressure`` where

* ``novelty`` ∈ [0, 1] is PARENT-scoped: the mean (over the parent
  page's images) of the min phash Hamming distance to the already-seen
  phash sample, /64 — links found on pages with novel imagery are
  crawled sooner. Per-host novelty would be a no-op (per-host budgets
  rank rows within a host, where a host-constant shifts nothing), which
  is exactly the r01 flaw this replaces.
* ``budget_pressure`` ∈ [0, 1) is the host's frontier-backlog ratio
  ``backlog / (backlog + budget)`` — hosts with deep backlogs get
  deprioritized relative to their budget.

The heavy row-level math (the Hamming matrix against the sample) lives
in :func:`novelty_udf`, one popcount-table matrix per Arrow batch; the
linear combine in :func:`priority_udf` is also Arrow-vectorized (no
per-row Python anywhere, per the north rule).

The reference's analog is pure BFS depth (the ``join_all`` level
barrier, wintergreen.rs:160-182).  Ordering parity therefore requires
the depth term to dominate: with ``w_novelty + w_budget < w_depth``
(both terms normalized to [0, 1]) the non-depth terms only reorder
*within* a depth level (SURVEY.md §4.4); with both zero the order is
exactly the oracle's (depth, ord).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from ..synth.phash import hamming64_np


@dataclass(frozen=True)
class PriorityWeights:
    depth: float = 1.0
    novelty: float = 0.0   # parity-safe default; enable for novelty-seeking
    budget: float = 0.0

    def __post_init__(self):
        if self.novelty + self.budget >= self.depth:
            raise ValueError("depth term must dominate for BFS-order parity")


def novelty_udf(seen_phashes: np.ndarray | None):
    """pandas UDF: phash (int64) -> min-Hamming-to-sample / 64 (double).

    ``seen_phashes`` is a small deterministic sample of already-crawled
    image phashes, broadcast via closure. Empty sample -> everything is
    maximally novel (1.0), matching "nothing seen yet". NULL phash -> 0.
    """
    sample = None
    if seen_phashes is not None and len(seen_phashes) > 0:
        sample = np.asarray(seen_phashes, dtype=np.int64)[:4096]

    @F.pandas_udf(DoubleType())
    def novelty(phash: pd.Series) -> pd.Series:
        if sample is None:
            return pd.Series(np.where(phash.isna().to_numpy(), 0.0, 1.0))
        ph = phash.fillna(0).to_numpy(dtype=np.int64)
        d = np.empty(len(ph), dtype=np.float64)
        CHUNK = 8192
        for lo in range(0, len(ph), CHUNK):
            hi = min(lo + CHUNK, len(ph))
            mat = hamming64_np(ph[lo:hi, None], sample[None, :])
            d[lo:hi] = mat.min(axis=1)
        return pd.Series(np.where(phash.isna().to_numpy(), 0.0, d / 64.0))

    return novelty


def priority_udf(weights: PriorityWeights):
    """pandas UDF (depth, novelty, backlog_pressure) -> priority double."""
    w = weights

    @F.pandas_udf(DoubleType())
    def score(depth: pd.Series, novelty: pd.Series, backlog: pd.Series) -> pd.Series:
        pr = -w.depth * depth.to_numpy(dtype=np.float64)
        if w.novelty > 0.0:
            pr = pr + w.novelty * np.clip(
                novelty.fillna(0.0).to_numpy(dtype=np.float64), 0.0, 1.0
            )
        if w.budget > 0.0:
            pr = pr - w.budget * np.clip(
                backlog.fillna(0.0).to_numpy(dtype=np.float64), 0.0, 1.0
            )
        return pd.Series(pr)

    return score


def novelty_py(phash: int | None, seen_phashes) -> float:
    """Pure-Python twin of :func:`novelty_udf` for parity tests."""
    if phash is None:
        return 0.0
    if seen_phashes is None or len(seen_phashes) == 0:
        return 1.0
    sample = list(seen_phashes)[:4096]
    best = min(bin(((phash ^ s) & 0xFFFFFFFFFFFFFFFF)).count("1") for s in sample)
    return best / 64.0


def parity_priority(depth_col: Column) -> Column:
    """The zero-weights fast path: priority = -depth, JVM-side."""
    return (-depth_col).cast("double")
