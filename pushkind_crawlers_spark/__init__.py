"""pushkind_crawlers_spark — a PySpark-native URL-frontier + fetch scheduler.

A brand-new engine (NOT a port) with the query / data-processing
capabilities of the reference crawler service ``pushkindt/pushkind-crawlers``
(Rust / Tokio / Diesel / ZeroMQ, surveyed in SURVEY.md).  The reference's
dataflow — BFS frontier rounds, first-discovery-wins URL dedup, per-host
politeness budgets, validated product extraction, upsert-by-URL persistence,
embedding top-k association — is re-expressed Spark-first:

* frontier / seen / results / images are partitioned snapshot tables
  (Iceberg when the runtime jar is present, a hermetic parquet-manifest
  fallback otherwise — ``store.snapshots``),
* the URL-seen set is a broadcast Bloom filter fast path + exact anti-join
  confirm, with per-partition cuckoo filters for intra-batch dedup
  (``operators.seen``),
* politeness + robots are a dimension table enforced by host-salted
  repartitioning with explicit hot-host skew splitting and deterministic
  budget truncation (``operators.budget``),
* priority scoring (depth + host-budget + phash novelty) runs in
  vectorized Arrow/pandas UDFs — no per-row Python (``operators.priority``),
* the fetch stage is ``mapInPandas`` over frontier partitions against a
  pluggable fetcher; tests use a deterministic synthetic site generator
  (``synth.worldgen``) shared with the pure-Python parity oracle
  (``oracle``).
"""

__version__ = "0.1.0"
