"""Frontier priority scoring — vectorized Arrow UDF (north rule).

``priority = -w_depth * depth + w_novelty * (novelty/64) - w_budget *
budget_pressure`` where ``novelty`` is the min phash Hamming distance of
the parent page's images to the already-seen phash sample (novel imagery
-> crawl its outlinks sooner) and ``budget_pressure`` is the host's
frontier-backlog / budget ratio (busy hosts deprioritized).

The reference's analog is pure BFS depth (the ``join_all`` level barrier,
wintergreen.rs:160-182).  Ordering parity therefore requires the depth
term to dominate: with ``w_novelty + w_budget < w_depth`` (novelty and
pressure are normalized to [0, 1]) the non-depth terms only reorder
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


def priority_udf(weights: PriorityWeights, seen_phashes: np.ndarray | None = None):
    """pandas UDF (depth, parent_phash, backlog_ratio) -> priority double.

    ``seen_phashes`` is a (small, sampled) int64 array of already-crawled
    image phashes, broadcast via closure; novelty = min Hamming distance
    to it, normalized by 64 bits.
    """
    w = weights
    sample = None
    if seen_phashes is not None and len(seen_phashes) > 0:
        sample = np.asarray(seen_phashes, dtype=np.int64)[:4096]

    @F.pandas_udf(DoubleType())
    def score(depth: pd.Series, parent_phash: pd.Series, backlog: pd.Series) -> pd.Series:
        pr = -w.depth * depth.to_numpy(dtype=np.float64)
        if w.novelty > 0.0 and sample is not None:
            ph = parent_phash.fillna(0).to_numpy(dtype=np.int64)
            # (n, s) hamming matrix via popcount table, min over sample
            d = np.empty(len(ph), dtype=np.float64)
            CHUNK = 8192
            for lo in range(0, len(ph), CHUNK):
                hi = min(lo + CHUNK, len(ph))
                mat = hamming64_np(ph[lo:hi, None], sample[None, :])
                d[lo:hi] = mat.min(axis=1)
            nov = np.where(parent_phash.isna().to_numpy(), 0.0, d / 64.0)
            pr = pr + w.novelty * nov
        if w.budget > 0.0:
            pr = pr - w.budget * np.clip(backlog.fillna(0.0).to_numpy(dtype=np.float64), 0.0, 1.0)
        return pd.Series(pr)

    return score


def parity_priority(depth_col: Column) -> Column:
    """The zero-weights fast path: priority = -depth, JVM-side."""
    return (-depth_col).cast("double")
