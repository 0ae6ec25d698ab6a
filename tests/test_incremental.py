"""Snapshot-incremental index maintenance (SURVEY.md §2.10) + streaming."""

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from invoicenet_spark.config import EngineConfig
from invoicenet_spark.fixtures import gen_pages_pandas, gen_pages_spark, gen_queries
from invoicenet_spark.oracle.bm25_numpy import NumpyBM25Oracle
from invoicenet_spark.query.exec import load_index, search
from invoicenet_spark.sources.snapshots import SnapshotTable
from invoicenet_spark.streaming.incremental import stream_pages_to_index, update_index

CFG = EngineConfig(shard_size=64, block_size=16, build_partitions=4)


@pytest.fixture(scope="module")
def incr_index(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("snap")
    table = SnapshotTable(str(root / "pages"))
    idx_dir = str(root / "index")
    # snapshot 1: docs 0..149; snapshot 2: docs 150..249
    table.append(gen_pages_spark(spark, 150, seed=42, partitions=4))
    r1 = update_index(spark, table, idx_dir, CFG)
    assert r1["indexed_snapshot_id"] == 1 and r1["docs_added"] > 0
    table.append(gen_pages_spark(spark, 100, seed=42, partitions=4, start=150))
    r2 = update_index(spark, table, idx_dir, CFG)
    assert r2["indexed_snapshot_id"] == 2 and r2["docs_added"] > 0
    return table, idx_dir


def test_noop_update(spark, incr_index):
    table, idx_dir = incr_index
    r3 = update_index(spark, table, idx_dir, CFG)
    assert r3["docs_added"] == 0


def test_incremental_matches_oracle(spark, incr_index):
    """After two snapshots, results are rank-identical to an oracle over the
    union corpus — proves stats refresh + immutable old segments compose."""
    _, idx_dir = incr_index
    index = load_index(spark, idx_dir)
    pages = gen_pages_pandas(250, seed=42)
    en = pages[pages["lang"] == "en"]
    id_map = {r["url"]: r["doc_id"] for r in index.docs.select("url", "doc_id").collect()}
    assert len(id_map) == len(en)
    oracle = NumpyBM25Oracle({id_map[u]: t for u, t in zip(en["url"], en["text"])})
    assert index.N == oracle.N
    assert abs(index.avgdl - oracle.avgdl) < 1e-9

    queries = gen_queries(30, seed=42)
    res = search(spark, index, queries, kernel="auto").collect()
    by_q = {}
    for r in res:
        by_q.setdefault(r["query_id"], []).append(r)
    for _, row in queries.iterrows():
        expect = oracle.topk(list(row["terms"]), k=row["k"], mode=row["mode"])
        got = sorted(by_q.get(row["query_id"], []), key=lambda r: r["rank"])
        assert [g["doc_id"] for g in got] == [d for d, _ in expect], row["query_id"]
        for g, (_, s) in zip(got, expect):
            assert abs(g["score"] - s) < 1e-9


def test_old_segments_immutable(spark, incr_index):
    table, idx_dir = incr_index
    import json

    from invoicenet_spark.index.shardlog import ShardLog

    log = ShardLog(idx_dir)
    entries = log.entries()
    assert entries and all(v["status"] == "committed" for v in entries.values())
    # finalize refreshed per-shard metrics into the log
    assert all("n_postings" in v for v in entries.values())
    with open(os.path.join(idx_dir, "manifest.json")) as f:
        manifest = json.load(f)
    assert manifest["indexed_snapshot_id"] == 2
    assert "shards" not in manifest  # global state stays fixed-size
    # docs table is segment-partitioned: base + one segment per snapshot delta
    segs = {
        r["segment"]
        for r in spark.read.parquet(os.path.join(idx_dir, "docs")).select("segment").distinct().collect()
    }
    assert segs == {"base", "snap2"}


def test_update_retry_is_idempotent(spark, tmp_path, monkeypatch):
    """Crash after the docs append but before commit → retry must not
    duplicate doc rows or inflate N/avgdl (round-1 ADVICE item)."""
    import invoicenet_spark.streaming.incremental as inc

    table = SnapshotTable(str(tmp_path / "pages"))
    idx_dir = str(tmp_path / "index")
    table.append(gen_pages_spark(spark, 80, seed=42, partitions=2))
    update_index(spark, table, idx_dir, CFG)
    n_base = spark.read.parquet(os.path.join(idx_dir, "docs")).count()

    table.append(gen_pages_spark(spark, 40, seed=42, partitions=2, start=80))

    real_encode = inc._encode_and_commit

    def boom(*a, **kw):
        raise RuntimeError("injected crash after docs append")

    monkeypatch.setattr(inc, "_encode_and_commit", boom)
    with pytest.raises(RuntimeError, match="injected"):
        update_index(spark, table, idx_dir, CFG)
    # docs were appended by the aborted attempt
    assert spark.read.parquet(os.path.join(idx_dir, "docs")).count() > n_base

    monkeypatch.setattr(inc, "_encode_and_commit", real_encode)
    r = update_index(spark, table, idx_dir, CFG)
    assert r["indexed_snapshot_id"] == 2 and r["docs_added"] > 0

    docs = spark.read.parquet(os.path.join(idx_dir, "docs"))
    # no duplicate urls, N consistent with stats
    assert docs.count() == docs.select("url").distinct().count()
    index = load_index(spark, idx_dir)
    assert index.N == docs.count()
    # a second retry is a no-op
    assert update_index(spark, table, idx_dir, CFG)["docs_added"] == 0


def test_build_resume_after_injected_failure(spark, tmp_path):
    """Per-shard lineage: a build killed after one committed shard resumes
    and completes without rewriting the committed shard."""
    from invoicenet_spark.index.build import build_index

    pages = gen_pages_spark(spark, 200, seed=42, partitions=4)
    out = str(tmp_path / "idx")
    with pytest.raises(RuntimeError, match="injected failure"):
        build_index(spark, pages, out, CFG, fail_after_shards=1)
    from invoicenet_spark.index.shardlog import ShardLog

    committed_before = ShardLog(out).committed()
    assert len(committed_before) == 1
    shard = next(iter(committed_before))
    mtime_before = os.path.getmtime(os.path.join(out, "postings", f"shard={shard}"))

    build_index(spark, pages, out, CFG, resume=True)
    assert os.path.getmtime(os.path.join(out, "postings", f"shard={shard}")) == mtime_before
    index = load_index(spark, out)
    assert search(spark, index, gen_queries(5, seed=42)).count() >= 0


def test_shard_log_scale_ops(tmp_path):
    """10^4 shards: each commit is O(1) (one appended line), reads round-trip,
    compaction folds runs into one file."""
    from invoicenet_spark.index.shardlog import ShardLog

    log = ShardLog(str(tmp_path))
    for s in range(10_000):
        log.append(s)
    log.close()
    log2 = ShardLog(str(tmp_path))
    assert len(log2.committed()) == 10_000
    log2.append_many([{"shard": s, "status": "committed", "n_postings": s} for s in range(10_000)])
    log2.compact()
    files = [f for f in os.listdir(log2.dir) if f.endswith(".jsonl")]
    assert len(files) == 1
    ent = log2.entries()
    assert len(ent) == 10_000 and ent[7]["n_postings"] == 7


def test_structured_streaming_ingestion(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("stream")
    src = str(root / "arrivals")
    os.makedirs(src)
    gen_pages_spark(spark, 60, seed=42, partitions=2).write.mode("overwrite").parquet(
        os.path.join(src, "batch1")
    )
    # flatten: file source needs files under one dir
    import glob
    import shutil

    for i, f in enumerate(glob.glob(os.path.join(src, "batch1", "*.parquet"))):
        shutil.move(f, os.path.join(src, f"part1_{i}.parquet"))
    shutil.rmtree(os.path.join(src, "batch1"))

    q = stream_pages_to_index(
        spark, src, str(root / "table"), str(root / "index"),
        EngineConfig(shard_size=64, block_size=16, build_partitions=2),
        use_stored_text=True,
    )
    q.awaitTermination(120)
    index = load_index(spark, str(root / "index"))
    assert index.N > 0
    res = search(spark, index, gen_queries(5, seed=42)).count()
    assert res >= 0
