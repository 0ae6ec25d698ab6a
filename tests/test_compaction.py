"""Shard compaction (index/maintain.py): merge small incremental shards
into a larger shard_size WITHOUT re-tokenizing the corpus.

Invariants pinned:
- compacted postings are BYTE-IDENTICAL to a fresh build at the new
  shard_size over the same doc table (the decode→re-encode round-trip is
  lossless and the encoder is deterministic over pair rows) — for both
  plain and positional layouts. Compared on single builds, whose docID
  assignment is independent of shard_size; incremental histories assign
  ids against their own shard boundaries, so there the invariant is
  query-identity, not byte-identity.
- queries (incl. PHRASE on positional) are rank-identical before/after
  compacting an incremental-history index;
- absorbed old shards are retired atomically (never visible together with
  the new shards covering their range) and their files vacuum away;
- incremental update AFTER compaction aligns to the new boundaries.
"""

import pytest
from pyspark.sql import functions as F

from invoicenet_spark.config import EngineConfig
from invoicenet_spark.fixtures import gen_pages_spark, gen_queries
from invoicenet_spark.index.build import (
    IndexPaths,
    build_index,
    read_postings,
    vacuum_postings,
)
from invoicenet_spark.index.maintain import compact_index
from invoicenet_spark.query.exec import load_index, search
from invoicenet_spark.sources.snapshots import SnapshotTable
from invoicenet_spark.streaming.incremental import update_index

BLOB_COLS = ["doc_blob", "tf_blob", "dl_blob", "pos_blob"]


def _rows(spark, root):
    return (
        read_postings(spark, IndexPaths(root))
        .select("term_id", "shard", "df_shard", *BLOB_COLS, "block_last")
        .toPandas()
        .sort_values(["term_id", "shard"])
        .reset_index(drop=True)
    )


def _res(spark, root, queries, **kw):
    return sorted(
        (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 9))
        for r in search(spark, load_index(spark, root), queries, **kw).collect()
    )


@pytest.mark.parametrize("with_positions", [False, True])
def test_compaction_byte_identical_to_fresh_build(spark, tmp_path, with_positions):
    pages = gen_pages_spark(spark, 200, seed=42, partitions=4)
    small = EngineConfig(
        shard_size=32, block_size=16, build_partitions=4, with_positions=with_positions
    )
    big = EngineConfig(
        shard_size=128, block_size=16, build_partitions=4, with_positions=with_positions
    )
    idx = str(tmp_path / "idx")
    fresh = str(tmp_path / "fresh")
    build_index(spark, pages, idx, small)
    build_index(spark, pages, fresh, big)

    res = compact_index(spark, idx, new_shard_size=128)
    assert res["new_shards"] < res["old_shards"]

    pc, pf = _rows(spark, idx), _rows(spark, fresh)
    assert len(pc) == len(pf) > 0
    assert (pc["term_id"].values == pf["term_id"].values).all()
    assert (pc["shard"].values == pf["shard"].values).all()
    assert (pc["df_shard"].values == pf["df_shard"].values).all()
    for c in BLOB_COLS:
        assert all(bytes(a) == bytes(b) for a, b in zip(pc[c], pf[c])), c
    assert all(list(a) == list(b) for a, b in zip(pc["block_last"], pf["block_last"]))

    queries = gen_queries(20, seed=42)
    assert _res(spark, idx, queries) == _res(spark, fresh, queries)
    if with_positions:
        ph = queries[queries["terms"].map(len) == 2].copy()
        ph["mode"] = "PHRASE"
        assert len(ph) and _res(spark, idx, ph) == _res(spark, fresh, ph)


def test_compaction_of_incremental_history(spark, tmp_path):
    cfg = EngineConfig(shard_size=32, block_size=16, build_partitions=4)
    table = SnapshotTable(str(tmp_path / "pages"))
    idx = str(tmp_path / "idx")
    for lo, n in ((0, 80), (80, 60), (140, 60)):
        table.append(gen_pages_spark(spark, n, seed=42, partitions=2, start=lo))
        update_index(spark, table, idx, cfg)

    queries = gen_queries(25, seed=42)
    before = _res(spark, idx, queries)
    n_before = read_postings(spark, IndexPaths(idx)).select("shard").distinct().count()

    res = compact_index(spark, idx, new_shard_size=128)
    assert res["new_shards"] < res["old_shards"] == n_before

    # rank-identical queries after compaction
    assert _res(spark, idx, queries) == before

    # absorbed shards retired; orphan files vacuum away; reads unchanged
    removed = vacuum_postings(IndexPaths(idx))
    assert removed  # old small-shard files were orphaned by the compaction
    assert _res(spark, idx, queries) == before

    # incremental update AFTER compaction aligns to the new boundaries
    table.append(gen_pages_spark(spark, 40, seed=42, partitions=2, start=200))
    r = update_index(spark, table, idx, cfg)  # caller cfg ignored: manifest wins
    assert r["docs_added"] > 0
    docs = load_index(spark, idx).docs
    new_ids = [
        int(x["doc_id"])
        for x in docs.orderBy(F.desc("doc_id")).limit(r["docs_added"]).collect()
    ]
    assert min(new_ids) % 128 == 0  # next 128-aligned shard boundary
    assert search(spark, load_index(spark, idx), queries).count() > 0
