"""Append-only per-shard commit log — the scale-safe manifest.

Round-1 kept every shard's status inside one manifest.json rewritten after
each shard commit: O(total shards) driver work per commit and a single
global file — a bottleneck at web scale (millions of shards) and hostile to
object stores. This log is the replacement:

- one JSONL file per RUN under <root>/shard_log/, one line per committed
  shard, flushed per line → a commit is O(1) and durable the moment the
  line hits disk; a crash loses at most the in-flight line.
- reading the committed set = scan all log files once (O(total shards) at
  open, never per commit). `compact()` folds everything into a single file
  so the file count stays O(1) across runs rather than O(runs).
- the same shard may appear in multiple lines (retries, metric refreshes);
  later lines UPDATE the shard's record field-by-field (a metrics refresh
  does not clobber the committed file list), and a re-commit line carrying
  a new `files` list replaces the old one, which makes re-commits
  idempotent.

manifest.json keeps only fixed-size global state (config, corpus stats,
run metrics) — it never grows with the shard count.

Commit protocol (Iceberg/Delta-shaped): encode tasks write parquet straight
to the FINAL <postings>/shard=N/ directories (unique part-file names — no
staging dir, no driver-side rename loop); the log line recording each
shard's `files` list is the sole commit point. Readers construct the index
from the logged file lists (build.committed_postings_files), so partial
files from a crashed run are invisible until a later run commits its own
list. On an object store the append per run is one immutable object and
the data files are plain write-to-final-path PUTs — no rename semantics
assumed anywhere.
"""

from __future__ import annotations

import glob
import json
import os
import uuid


class ShardLog:
    def __init__(self, index_root: str):
        self.dir = os.path.join(index_root, "shard_log")
        os.makedirs(self.dir, exist_ok=True)
        self._fh = None

    # ------------------------------------------------------------- writing --
    def _file(self):
        if self._fh is None:
            # monotonic sequence prefix: "latest line wins" depends on file
            # name order == creation order (the uuid suffix only avoids
            # collisions between concurrent writers at the same sequence)
            seq = len(self._files()) + 1
            name = f"log-{seq:08d}-{uuid.uuid4().hex[:8]}.jsonl"
            self._fh = open(os.path.join(self.dir, name), "a")
        return self._fh

    def append(self, shard: int, status: str = "committed", **metrics) -> None:
        """O(1) durable commit record for one shard."""
        rec = {"shard": int(shard), "status": status, **metrics}
        f = self._file()
        f.write(json.dumps(rec) + "\n")
        f.flush()
        os.fsync(f.fileno())

    def append_many(self, rows: list[dict]) -> None:
        """Batch metric refresh (one flush for the whole batch)."""
        f = self._file()
        for rec in rows:
            f.write(json.dumps(rec) + "\n")
        f.flush()
        os.fsync(f.fileno())

    def close(self) -> None:
        if self._fh is not None:
            self._fh.close()
            self._fh = None

    # ------------------------------------------------------------- reading --
    def _files(self) -> list[str]:
        return sorted(glob.glob(os.path.join(self.dir, "*.jsonl")))

    def entries(self) -> dict[int, dict]:
        """Merged record per shard (file order is creation order; within a
        file, line order). Later lines update FIELDS rather than replacing
        the record, so a metrics-refresh line never erases the `files` list
        the commit line wrote."""
        out: dict[int, dict] = {}
        for path in self._files():
            with open(path) as f:
                for line in f:
                    line = line.strip()
                    if not line:
                        continue
                    rec = json.loads(line)
                    out.setdefault(int(rec["shard"]), {}).update(rec)
        return out

    def committed(self) -> set[int]:
        return {s for s, rec in self.entries().items() if rec.get("status") == "committed"}

    # ----------------------------------------------------------- compaction --
    def compact(self) -> None:
        """Fold all runs into one file so the log stays O(1) files. Written
        to a temp name then renamed over; old run files removed after."""
        old = self._files()
        if len(old) <= 1:
            return
        entries = self.entries()
        self.close()
        tmp = os.path.join(self.dir, f".compact-{uuid.uuid4().hex}.tmp")
        with open(tmp, "w") as f:
            for shard in sorted(entries):
                f.write(json.dumps(entries[shard]) + "\n")
            f.flush()
            os.fsync(f.fileno())
        final = os.path.join(self.dir, "log-00000000-compacted.jsonl")
        os.replace(tmp, final)  # sorts before every run file (seq starts at 1)
        for path in old:
            if path != final:
                os.remove(path)
