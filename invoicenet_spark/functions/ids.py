"""Scalable deterministic dense-ID assignment.

Engine analog of the reference's bounded hash dictionaries
(invoicenet/acp/data.py:145-148: md5(text) % 2^16) — but hash-only IDs
collide, and rank-identity (north_rule) forbids collisions. So IDs are
dense 0..n-1, assigned WITHOUT a single-partition global sort:

  1. repartition(P, key)  — HASH partitioning: placement is a pure function
     of the key value, so separate Spark jobs over the same lineage see
     identical partition contents. (repartitionByRange is NOT usable here:
     its sampled boundaries are not stable across the two jobs below, which
     produced duplicate/gapped IDs at 20k docs.)
  2. sortWithinPartitions(key) — total order inside each partition, so the
     local ordinal is deterministic regardless of arrival order.
  3. count rows per partition (job 1; tiny driver-side list).
  4. exclusive prefix-sum of counts → per-partition base offset.
  5. mapInPandas adds base + local ordinal (job 2).

The classic zipWithIndex offset trick in DataFrame/Arrow terms; scales to
10^12 keys (each task sees only its own hash bucket; driver holds one long
per partition). IDs are dense and deterministic but NOT globally ordered by
key — no engine invariant needs global order, only a fixed total order for
tie-breaks, which (partition(key), key) provides.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F


def assign_dense_ids(
    df: DataFrame,
    key: str,
    id_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Add ``id_col`` = dense 0-based ID over distinct ``key``.

    Input must already be distinct on ``key`` (caller does .distinct() /
    groupBy first). Deterministic for any partitioning of the input.
    """
    n_parts = num_partitions or df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    ranged = (
        df.repartition(int(n_parts), F.col(key))
        .sortWithinPartitions(key)
        .withColumn("_pid", F.spark_partition_id())
    )
    # Job 1: per-partition counts (tiny: one row per partition).
    counts = {
        r["_pid"]: r["cnt"]
        for r in ranged.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()
    }
    max_pid = max(counts) if counts else -1
    offsets = np.zeros(max_pid + 2, dtype=np.int64)
    for pid in range(max_pid + 1):
        offsets[pid + 1] = offsets[pid] + counts.get(pid, 0)
    base = {pid: int(offsets[pid]) for pid in range(max_pid + 1)}

    out_schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields]
        + [f"`{id_col}` long"]
    )

    def add_ids(batches):
        # Job 2: rows arrive sorted by key within the partition; _pid is
        # constant per partition. Hash placement guarantees these are the
        # same partitions job 1 counted.
        seen = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pid = int(pdf["_pid"].iloc[0])
            start = base[pid] + seen
            seen += len(pdf)
            out = pdf.drop(columns=["_pid"])
            out[id_col] = np.arange(start, start + len(pdf), dtype=np.int64)
            yield out

    return ranged.mapInPandas(add_ids, schema=out_schema)
