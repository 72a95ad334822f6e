"""Snapshot-committed parquet tables — a hermetic Iceberg stand-in.

Layout per table::

    <root>/<table>/snap-00000042/part-*.parquet   # immutable data files
    <root>/<table>/_manifest.json                 # atomic pointer + history

A snapshot is a LIST of data directories (``paths``): an *overwrite*
snapshot has one fresh directory; an *append* snapshot reuses the parent's
directories plus one delta directory — exactly Iceberg's append commit, so
a round that adds 1k rows to a 10^10-row table writes 1k rows, not the
table.  Row counts come from parquet footers (pyarrow, driver-side, no
Spark job).

Commit protocol (mirrors Iceberg's optimistic snapshot commit):
1. write the new snapshot directory (never touching prior snapshots),
2. atomically rename a tmp manifest over ``_manifest.json`` pointing at it.

A crash between (1) and (2) leaves the table at the previous snapshot —
exactly the resumability contract the north rule requires.
``SnapshotStore.commit_round`` groups snapshots of several tables into one
run-level atomic commit (the engine's per-round commit of
frontier/seen/results/images/lineage).

Replaces the reference's SQLite transactions
(/root/reference/src/repository/product.rs:99-111) and fixes its
flag-leak-on-early-return flaw (SPEC.md:353) — state only advances via
committed snapshots.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import time
import uuid
from dataclasses import dataclass

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def parquet_rows(path: str) -> int:
    """Row count from parquet footers — no Spark job, no data read."""
    return sum(
        pq.read_metadata(f).num_rows
        for f in glob.glob(os.path.join(path, "*.parquet"))
    )


@dataclass
class Snapshot:
    snapshot_id: int
    parent_id: int | None
    paths: list[str]
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

    @staticmethod
    def _snap_paths(snap: dict) -> list[str]:
        # tolerate the legacy single-path record shape
        return snap["paths"] if "paths" in snap else [snap["path"]]

    # ---- reads -----------------------------------------------------------

    def current_snapshot_id(self) -> int | None:
        return self._read_manifest()["current"]

    def snapshots(self) -> list[dict]:
        return self._read_manifest()["snapshots"]

    def _snapshot(self, m: dict, sid: int) -> dict:
        try:
            return next(s for s in m["snapshots"] if s["snapshot_id"] == sid)
        except StopIteration:
            raise KeyError(f"{self.name}: no snapshot {sid}") from None

    def row_count(self, snapshot_id: int | None = None) -> int:
        m = self._read_manifest()
        sid = snapshot_id if snapshot_id is not None else m["current"]
        if sid is None:
            return 0
        return self._snapshot(m, sid)["row_count"]

    def read(self, spark: SparkSession, snapshot_id: int | None = None) -> DataFrame:
        m = self._read_manifest()
        sid = snapshot_id if snapshot_id is not None else m["current"]
        if sid is None:
            if self.schema is None:
                raise ValueError(f"{self.name}: empty table with no schema")
            return spark.createDataFrame([], self.schema)
        paths = self._snap_paths(self._snapshot(m, sid))
        if not paths:
            return spark.createDataFrame([], self.schema)
        reader = spark.read.schema(self.schema) if self.schema else spark.read
        df = reader.parquet(*paths)
        return df.select(*[f.name for f in self.schema.fields]) if self.schema else df

    # ---- writes ----------------------------------------------------------

    def stage(self, df: DataFrame) -> tuple[str, int]:
        """Write a snapshot data directory without publishing; (path, rows).

        Row count comes from the written footers — no extra Spark job."""
        path = os.path.join(self.dir, f"data-{uuid.uuid4().hex[:12]}")
        df.write.mode("overwrite").parquet(path)
        return path, parquet_rows(path)

    def publish(self, path: str, row_count: int, properties: dict | None = None,
                mode: str = "overwrite", parent_id: int | None = None) -> int:
        """Point the table at a staged directory.

        mode='overwrite': the snapshot is exactly ``path``.
        mode='append': the snapshot is parent.paths + [path] (delta commit);
        empty deltas reuse the parent paths without adding a directory.
        ``parent_id`` pins the append base — a retried round MUST append
        onto the snapshot its inputs were read from (recorded in the run
        manifest), never onto a possibly-orphaned table ``current`` left
        by a crash between per-table publish and the run-manifest swap.
        """
        m = self._read_manifest()
        next_id = (max((s["snapshot_id"] for s in m["snapshots"]), default=0)) + 1
        base = parent_id if parent_id is not None else m["current"]
        if mode == "append" and base is not None:
            parent = self._snapshot(m, base)
            paths = self._snap_paths(parent) + ([path] if row_count > 0 else [])
            total = parent["row_count"] + row_count
        else:
            paths = [path]
            total = row_count
        snap = {
            "snapshot_id": next_id,
            "parent_id": m["current"],
            "paths": paths,
            "row_count": total,
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
        """Delta append: stages only ``df`` and links the parent's files."""
        path, n = self.stage(df)
        return self.publish(path, n, properties, mode="append")

    def rollback(self, snapshot_id: int) -> None:
        m = self._read_manifest()
        self._snapshot(m, snapshot_id)  # raises KeyError if missing
        m["current"] = snapshot_id
        self._write_manifest(m)

    def expire_snapshots(self, keep_last: int = 5) -> None:
        """GC snapshot records + any data dir no kept snapshot references."""
        m = self._read_manifest()
        keep = {s["snapshot_id"] for s in m["snapshots"][-keep_last:]}
        if m["current"] is not None:
            keep.add(m["current"])
        kept = [s for s in m["snapshots"] if s["snapshot_id"] in keep]
        referenced = {p for s in kept for p in self._snap_paths(s)}
        for s in m["snapshots"]:
            for p in self._snap_paths(s):
                if p not in referenced:
                    shutil.rmtree(p, ignore_errors=True)
                    referenced.add(p)  # only attempt once
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
        self,
        staged: dict[str, tuple[str, int]],
        round_no: int,
        run_id: str,
        extra: dict | None = None,
        append_tables: set[str] | frozenset[str] = frozenset(),
        parents: dict[str, int] | None = None,
    ) -> dict[str, int]:
        """Publish staged snapshots for several tables (append-mode for
        ``append_tables``, overwrite otherwise), then atomically record the
        round in the run manifest.  Readers resume from the run manifest,
        so a crash mid-publish is invisible (the previous round stays
        current for the resume path).  ``parents`` pins each append's base
        to the snapshot the round actually read (crash-retry safety)."""
        snapshot_ids = {}
        for name, (path, n) in staged.items():
            snapshot_ids[name] = self._tables[name].publish(
                path, n, {"run_id": run_id, "round": round_no},
                mode="append" if name in append_tables else "overwrite",
                parent_id=(parents or {}).get(name),
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
