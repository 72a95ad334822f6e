"""Table storage: snapshot-committed tables with time travel + resume.

``snapshots.SnapshotStore`` is a hermetic parquet-manifest implementation of
the Iceberg commit model (atomic snapshot commit, read-at-snapshot,
rollback); when an Iceberg runtime jar is on the classpath the same call
sites can bind to real Iceberg tables (``tables.iceberg_available``).
"""
