"""Index maintenance: shard compaction (the Lucene-merge-policy analog).

Incremental updates (streaming/incremental.py) append new docID-range
shards per snapshot delta; after many small deltas an index accumulates
many small shards, and every query fans its per-(query, shard) kernels
across all of them. `compact_index` re-shapes the index to a larger
shard_size WITHOUT touching the raw corpus: posting rows are decoded back
to (term_id, doc_id, doc_len, tf[, pos]) pair/token rows (lossless —
codec.decode_posting_list/decode_positions), then flow through the SAME
range-partition + sort + vectorized-encode pipeline as a fresh build. The
result is byte-identical to an index built from scratch at the new
shard_size (pinned by test), because the encoder is a deterministic
function of the pair rows.

Skipping extract + tokenize matters at scale: those are the dominant build
phases, and compaction touches only the (much smaller) encoded index.

Commit protocol: new shards write-and-commit through the same shard-log
path as builds (write to final dirs, log line = commit); old shards whose
docID range was absorbed are marked status="replaced" in the SAME batched
log append, and their data files become orphans for vacuum_postings().
Readers that opened the log before the append keep a consistent pre-compact
view (their file list still exists on disk until vacuum). Single
maintenance writer assumed, like any merge policy.

Constraints: new_shard_size must be a multiple of the current shard_size
(merged shards are unions of whole old docID ranges, so incremental
update's next-shard-boundary math stays aligned).
"""

from __future__ import annotations

import time

import numpy as np
from pyspark.sql import SparkSession, functions as F

from invoicenet_spark.index.build import (
    IndexPaths,
    POSTINGS_SCHEMA,
    _encode_partition,
    _finalize,
    _load_manifest,
    _save_manifest,
    cfg_from_manifest,
    read_postings,
    write_and_commit_postings,
)
from invoicenet_spark.index.shardlog import ShardLog


def _decode_partition(batches, positional: bool):
    """mapInArrow kernel: encoded posting rows → pair rows
    (term_id, doc_id, doc_len, tf) or token rows (…, pos) for positional
    indexes. Per-row varbyte decode is vectorized numpy; row count is
    O(distinct (term, shard)), far below posting count."""
    import pyarrow as pa

    from invoicenet_spark.index.codec import decode_posting_list, decode_positions

    for batch in batches:
        tids_out, docs_out, dls_out, last_out = [], [], [], []
        for row in batch.to_pylist():
            doc_ids, tfs, dls = decode_posting_list(row)
            if positional:
                pos_flat, _ = decode_positions(row, tfs)
                tids_out.append(np.full(pos_flat.size, row["term_id"], dtype=np.int64))
                docs_out.append(np.repeat(doc_ids, tfs))
                dls_out.append(np.repeat(dls, tfs).astype(np.int32))
                last_out.append(pos_flat)
            else:
                tids_out.append(np.full(doc_ids.size, row["term_id"], dtype=np.int64))
                docs_out.append(doc_ids)
                dls_out.append(dls.astype(np.int32))
                last_out.append(tfs)
        if not tids_out:
            continue
        arrays = [
            pa.array(np.concatenate(tids_out)),
            pa.array(np.concatenate(docs_out)),
            pa.array(np.concatenate(dls_out), type=pa.int32()),
            pa.array(np.concatenate(last_out)),
        ]
        names = ["term_id", "doc_id", "doc_len", "pos" if positional else "tf"]
        yield pa.RecordBatch.from_arrays(arrays, names=names)


def compact_index(
    spark: SparkSession,
    root: str,
    new_shard_size: int,
) -> dict:
    """Merge small docID-range shards into shards of `new_shard_size` docs.

    Returns {"old_shards": n, "new_shards": m, "seconds": s}. The compacted
    index is byte-identical to a fresh build at new_shard_size and serves
    queries identically (both pinned by tests/test_compaction.py); the
    manifest/stats record the new layout so later incremental updates align
    to the new boundaries.
    """
    from invoicenet_spark.config import EngineConfig

    paths = IndexPaths(root)
    manifest = _load_manifest(paths)
    if not manifest.get("config"):
        raise ValueError(f"{root}: no manifest config — not an index")
    cfg = cfg_from_manifest(manifest, EngineConfig())
    if new_shard_size % cfg.shard_size:
        raise ValueError(
            f"new_shard_size {new_shard_size} must be a multiple of the "
            f"current shard_size {cfg.shard_size}"
        )
    t0 = time.time()
    log = ShardLog(root)
    old_shards = sorted(log.committed())
    positional = bool(cfg.with_positions)

    pairs = read_postings(spark, paths).mapInArrow(
        lambda it: _decode_partition(it, positional),
        schema=(
            "term_id long, doc_id long, doc_len int, "
            + ("pos long" if positional else "tf long")
        ),
    )
    shard_expr = (F.col("doc_id") / F.lit(new_shard_size)).cast("long")
    sort_cols = ["term_id", "doc_id", "pos"] if positional else ["term_id", "doc_id"]
    encoded = (
        pairs.repartitionByRange(cfg.build_partitions, F.col("term_id"), shard_expr)
        .sortWithinPartitions(*sort_cols)
        .mapInArrow(
            lambda it: _encode_partition(it, cfg.block_size, new_shard_size),
            schema=POSTINGS_SCHEMA,
        )
    )
    new_shards = sorted({s * cfg.shard_size // new_shard_size for s in old_shards})
    # retire absorbed old shard ids in the SAME batched log append as the
    # new commits — a crash can never leave both an old shard and the new
    # shard covering its docID range visible together (ids colliding with a
    # new shard are re-committed with the new file list, which replaces the
    # old one under the log's field-merge semantics)
    retire = [
        {"shard": int(s), "status": "replaced"}
        for s in old_shards
        if s not in set(new_shards)
    ]
    write_and_commit_postings(encoded, new_shards, paths, log, also_append=retire)

    # the docs table is NOT touched: its stored `shard` column is advisory
    # (every consumer derives shard from doc_id + the manifest shard_size),
    # so compaction mutates nothing outside the commit log + new postings
    # files — no rewrite window in which readers could see a missing or
    # half-swapped docs table.

    # persist the new layout, then refresh terms/stats/metrics
    manifest.setdefault("config", {})["shard_size"] = int(new_shard_size)
    _save_manifest(paths, manifest)
    cfg = cfg_from_manifest(manifest, cfg)
    docs = spark.read.parquet(paths.docs)
    observed = {"n_docs": docs.count(), "posting_rows": 0, "n_postings": 0}
    _finalize(spark, docs, cfg, paths, manifest, log, t0, observed)
    return {
        "old_shards": len(old_shards),
        "new_shards": len(new_shards),
        "seconds": round(time.time() - t0, 3),
    }
