"""Custom stateful streaming operators (applyInPandasWithState).

The built-in ``dropDuplicates`` keeps opaque per-key state; these
operators OWN their state layout, which is what a 10^10-URL streaming
frontier needs — the seen-set per shard is an explicit numpy structure
(exact int64 set here; the cuckoo filter from operators/seen.py drops in
for lossy-with-delete semantics), so eviction/TTL policy is a code
decision rather than watermark-implied.

* :func:`stateful_seen_filter` — streaming first-wins URL dedup: rows
  are sharded by ``pmod(url_hash, n_shards)``; each shard's state is its
  sorted seen-hash array; only first occurrences are emitted. This is
  the streaming twin of the batch engine's frontier dedup
  (operators/seen.py:filter_new_urls).
* :func:`stateful_host_stats` — running per-host fetch totals across
  micro-batches (the streaming twin of the lineage aggregates).

Reference analog: the reference's crawl keeps its seen-set in task
memory for the crawl's lifetime (wintergreen.rs:176) — state here is the
checkpointed, shard-distributed version of exactly that.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SEEN_OUT_SCHEMA = "url_hash long, url string, host string, ord string"
_SEEN_STATE_SCHEMA = "seen binary"

STATS_OUT_SCHEMA = "host string, total_rows long, batches long"
_STATS_STATE_SCHEMA = "total_rows long, batches long"


def _seen_filter_fn(
    key: Tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    seen = (
        np.frombuffer(state.get[0], dtype=np.int64)
        if state.exists else np.empty(0, dtype=np.int64)
    )
    out = []
    for pdf in pdfs:
        h = pdf["url_hash"].to_numpy(dtype=np.int64)
        # not in the shard's state AND first occurrence within the batch
        fresh = ~np.isin(h, seen) & ~pd.Series(h).duplicated().to_numpy()
        kept = pdf.loc[fresh, ["url_hash", "url", "host", "ord"]]
        if len(kept):
            out.append(kept)
            seen = np.union1d(seen, h[fresh])
    state.update((seen.tobytes(),))
    if out:
        yield pd.concat(out, ignore_index=True)


def stateful_seen_filter(rows: DataFrame, n_shards: int = 64) -> DataFrame:
    """Streaming first-wins URL dedup with explicit per-shard state."""
    sharded = rows.withColumn(
        "_shard", F.pmod(F.xxhash64("url_hash"), F.lit(n_shards))
    )
    return (
        sharded.groupBy("_shard")
        .applyInPandasWithState(
            _seen_filter_fn, SEEN_OUT_SCHEMA, _SEEN_STATE_SCHEMA,
            "append", GroupStateTimeout.NoTimeout,
        )
    )


def _host_stats_fn(
    key: Tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    total, batches = state.get if state.exists else (0, 0)
    n = 0
    for pdf in pdfs:
        n += len(pdf)
    total += n
    batches += 1
    state.update((total, batches))
    yield pd.DataFrame({"host": [key[0]], "total_rows": [total], "batches": [batches]})


def stateful_host_stats(rows: DataFrame) -> DataFrame:
    """Running per-host totals across micro-batches (update mode)."""
    return rows.groupBy("host").applyInPandasWithState(
        _host_stats_fn, STATS_OUT_SCHEMA, _STATS_STATE_SCHEMA,
        "update", GroupStateTimeout.NoTimeout,
    )
