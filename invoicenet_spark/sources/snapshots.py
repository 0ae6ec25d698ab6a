"""Snapshot-versioned pages table (Iceberg-style, parquet-backed fallback).

The north_rule asks for Iceberg tables with snapshot-checkpointed resumable
builds. The sandbox image has no Iceberg runtime jar (no network), so this
module provides the same contract behind a plain-parquet layout — the writer
interface is what the engine codes against, and an Iceberg-backed
implementation slots in by swapping this class (SURVEY.md §7 M2 note).

Layout:
    <root>/snap=<n>/*.parquet     rows appended in snapshot n
    <root>/_snapshots.json        ordered snapshot metadata (id, n_rows, ts)

Incremental scan = read only `snap=k` directories with k > last indexed —
the parquet twin of Iceberg's incremental read between snapshot IDs.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F


class SnapshotTable:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    @property
    def _meta_path(self) -> str:
        return os.path.join(self.root, "_snapshots.json")

    def snapshots(self) -> list[dict]:
        if not os.path.exists(self._meta_path):
            return []
        with open(self._meta_path) as f:
            return json.load(f)

    def current_snapshot_id(self) -> int | None:
        snaps = self.snapshots()
        return snaps[-1]["id"] if snaps else None

    def append(self, df: DataFrame) -> int:
        """Append rows as a new snapshot; returns the new snapshot id."""
        snaps = self.snapshots()
        sid = (snaps[-1]["id"] + 1) if snaps else 1
        path = os.path.join(self.root, f"snap={sid}")
        df.write.mode("errorifexists").parquet(path)
        n = df.sparkSession.read.parquet(path).count()
        snaps.append({"id": sid, "n_rows": n})
        tmp = self._meta_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(snaps, f)
        os.replace(tmp, self._meta_path)
        return sid

    def read(self, spark: SparkSession, as_of: int | None = None) -> DataFrame:
        """Full-table scan as of a snapshot (default: latest)."""
        snaps = self.snapshots()
        if as_of is not None:
            snaps = [s for s in snaps if s["id"] <= as_of]
        if not snaps:
            raise ValueError(f"no snapshots in {self.root}")
        paths = [os.path.join(self.root, f"snap={s['id']}") for s in snaps]
        return spark.read.parquet(*paths)

    def read_incremental(
        self, spark: SparkSession, after: int | None, until: int | None = None
    ) -> DataFrame | None:
        """Rows added strictly after snapshot `after` (None = from start)."""
        snaps = self.snapshots()
        picked = [
            s
            for s in snaps
            if (after is None or s["id"] > after) and (until is None or s["id"] <= until)
        ]
        if not picked:
            return None
        paths = [os.path.join(self.root, f"snap={s['id']}") for s in picked]
        return spark.read.parquet(*paths)
