"""Snapshot-committed parquet tables — a hermetic Iceberg stand-in.

Layout per table::

    <root>/<table>/snap-00000042/part-*.parquet   # immutable data files
    <root>/<table>/_manifest.json                 # atomic pointer + history

Commit protocol (mirrors Iceberg's optimistic snapshot commit):
1. write the new snapshot directory (never touching prior snapshots),
2. atomically rename a tmp manifest over ``_manifest.json`` pointing at it.

A crash between (1) and (2) leaves the table at the previous snapshot —
exactly the resumability contract the north rule requires.  ``MultiCommit``
groups snapshots of several tables into one run-level atomic commit (the
engine's per-round commit of frontier/seen/results/images/lineage).

Replaces the reference's SQLite transactions
(/root/reference/src/repository/product.rs:99-111) and fixes its
flag-leak-on-early-return flaw (SPEC.md:353) — state only advances via
committed snapshots.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


@dataclass
class Snapshot:
    snapshot_id: int
    parent_id: int | None
    path: str
    row_count: int
    committed_at: float
    properties: dict


class SnapshotTable:
    def __init__(self, root: str, name: str, schema: T.StructType | None = None):
        self.dir = os.path.join(root, name)
        self.name = name
        self.schema = schema
        os.makedirs(self.dir, exist_ok=True)

    @property
    def _manifest_path(self) -> str:
        return os.path.join(self.dir, "_manifest.json")

    def _read_manifest(self) -> dict:
        if not os.path.exists(self._manifest_path):
            return {"current": None, "snapshots": []}
        with open(self._manifest_path) as f:
            return json.load(f)

    def _write_manifest(self, manifest: dict) -> None:
        tmp = self._manifest_path + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._manifest_path)  # atomic pointer swap

    # ---- reads -----------------------------------------------------------

    def current_snapshot_id(self) -> int | None:
        return self._read_manifest()["current"]

    def snapshots(self) -> list[dict]:
        return self._read_manifest()["snapshots"]

    def read(self, spark: SparkSession, snapshot_id: int | None = None) -> DataFrame:
        m = self._read_manifest()
        sid = snapshot_id if snapshot_id is not None else m["current"]
        if sid is None:
            if self.schema is None:
                raise ValueError(f"{self.name}: empty table with no schema")
            return spark.createDataFrame([], self.schema)
        snap = next(s for s in m["snapshots"] if s["snapshot_id"] == sid)
        df = spark.read.parquet(snap["path"])
        return df.select(*[f.name for f in self.schema.fields]) if self.schema else df

    # ---- writes ----------------------------------------------------------

    def stage(self, df: DataFrame) -> tuple[str, int]:
        """Write a snapshot directory without publishing it; returns (path, rows)."""
        m = self._read_manifest()
        next_id = (max((s["snapshot_id"] for s in m["snapshots"]), default=0)) + 1
        path = os.path.join(self.dir, f"snap-{next_id:08d}")
        df.write.mode("overwrite").parquet(path)
        # cheap row count from parquet footers (no recompute of df lineage)
        n = df.sparkSession.read.parquet(path).count()
        return path, n

    def publish(self, path: str, row_count: int, properties: dict | None = None) -> int:
        m = self._read_manifest()
        next_id = (max((s["snapshot_id"] for s in m["snapshots"]), default=0)) + 1
        snap = {
            "snapshot_id": next_id,
            "parent_id": m["current"],
            "path": path,
            "row_count": row_count,
            "committed_at": time.time(),
            "properties": properties or {},
        }
        m["snapshots"].append(snap)
        m["current"] = next_id
        self._write_manifest(m)
        return next_id

    def commit(self, df: DataFrame, properties: dict | None = None) -> int:
        path, n = self.stage(df)
        return self.publish(path, n, properties)

    def append(self, spark: SparkSession, df: DataFrame, properties: dict | None = None) -> int:
        cur = self.read(spark)
        return self.commit(cur.unionByName(df), properties)

    def rollback(self, snapshot_id: int) -> None:
        m = self._read_manifest()
        if not any(s["snapshot_id"] == snapshot_id for s in m["snapshots"]):
            raise KeyError(f"{self.name}: no snapshot {snapshot_id}")
        m["current"] = snapshot_id
        self._write_manifest(m)

    def expire_snapshots(self, keep_last: int = 5) -> None:
        """GC old snapshot dirs, keeping the current chain's newest N."""
        m = self._read_manifest()
        keep = {s["snapshot_id"] for s in m["snapshots"][-keep_last:]}
        if m["current"] is not None:
            keep.add(m["current"])
        kept = []
        for s in m["snapshots"]:
            if s["snapshot_id"] in keep:
                kept.append(s)
            else:
                shutil.rmtree(s["path"], ignore_errors=True)
        m["snapshots"] = kept
        self._write_manifest(m)


class SnapshotStore:
    """A directory of snapshot tables + a run-level atomic multi-commit."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)
        self._tables: dict[str, SnapshotTable] = {}

    def table(self, name: str, schema: T.StructType | None = None) -> SnapshotTable:
        if name not in self._tables:
            self._tables[name] = SnapshotTable(self.root, name, schema)
        elif schema is not None:
            self._tables[name].schema = schema
        return self._tables[name]

    @property
    def _run_manifest_path(self) -> str:
        return os.path.join(self.root, "_run_manifest.json")

    def read_run_state(self) -> dict | None:
        if not os.path.exists(self._run_manifest_path):
            return None
        with open(self._run_manifest_path) as f:
            return json.load(f)

    def commit_round(
        self, staged: dict[str, tuple[str, int]], round_no: int, run_id: str, extra: dict | None = None
    ) -> dict[str, int]:
        """Publish staged snapshots for several tables, then atomically record
        the round in the run manifest.  Readers resume from the run manifest,
        so a crash mid-publish is invisible (the previous round stays current
        for the resume path)."""
        snapshot_ids = {}
        for name, (path, n) in staged.items():
            snapshot_ids[name] = self._tables[name].publish(
                path, n, {"run_id": run_id, "round": round_no}
            )
        state = {
            "run_id": run_id,
            "round": round_no,
            "snapshot_ids": snapshot_ids,
            "committed_at": time.time(),
            **(extra or {}),
        }
        tmp = self._run_manifest_path + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump(state, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._run_manifest_path)
        return snapshot_ids
