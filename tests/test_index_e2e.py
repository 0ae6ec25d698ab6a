"""End-to-end: build index on deterministic synthetic pages, answer the
reference query set, compare rank-identically vs the numpy BM25 oracle
(FIXTURES.md invariants 1-5)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from invoicenet_spark.config import EngineConfig
from invoicenet_spark.fixtures import gen_pages_pandas, gen_pages_spark, gen_queries
from invoicenet_spark.index.build import build_index
from invoicenet_spark.oracle.bm25_numpy import NumpyBM25Oracle, tokenize
from invoicenet_spark.query.exec import load_index, search

N_DOCS = 300
SEED = 42
CFG = EngineConfig(shard_size=64, block_size=16, build_partitions=8)  # multi-shard, multi-block


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory, tiny_pages):
    out = str(tmp_path_factory.mktemp("index"))
    paths = build_index(spark, tiny_pages, out, CFG)
    return load_index(spark, out)


@pytest.fixture(scope="module")
def oracle(built, spark):
    # oracle docs keyed by the engine's own doc_ids (dense url rank) — the
    # mapping is read back from the committed docs table, text from fixtures
    pages = gen_pages_pandas(N_DOCS, seed=SEED)
    en = pages[pages["lang"] == "en"]
    id_map = {r["url"]: r["doc_id"] for r in built.docs.select("url", "doc_id").collect()}
    docs = {id_map[u]: t for u, t in zip(en["url"], en["text"])}
    assert len(docs) == len(id_map)
    return NumpyBM25Oracle(docs)


def test_doc_table(built, oracle):
    # dense ids 0..N-1, doc_len matches oracle tokenization
    docs = built.docs.orderBy("doc_id").collect()
    ids = [r["doc_id"] for r in docs]
    assert ids == list(range(len(ids)))
    assert built.N == len(ids)
    for r in docs[:50]:
        assert r["doc_len"] == oracle.doc_len[r["doc_id"]]
    assert abs(built.avgdl - oracle.avgdl) < 1e-9


def test_df_matches_oracle(built, oracle):
    got = {r["term"]: r["df"] for r in built.terms.collect()}
    want = {t: len(p) for t, p in oracle.postings.items()}
    assert got == want


def test_rank_identity_vs_oracle(spark, built, oracle):
    queries = gen_queries(60, seed=SEED)
    res = search(spark, built, queries, kernel="auto").collect()
    by_q = {}
    for r in res:
        by_q.setdefault(r["query_id"], []).append(r)
    for _, row in queries.iterrows():
        qid = row["query_id"]
        expect = oracle.topk(list(row["terms"]), k=row["k"], mode=row["mode"])
        got = sorted(by_q.get(qid, []), key=lambda r: r["rank"])
        assert len(got) == len(expect), f"q{qid}: {len(got)} vs {len(expect)}"
        for g, (doc, score) in zip(got, expect):
            assert g["doc_id"] == doc, f"q{qid} rank {g['rank']}: {g['doc_id']} != {doc}"
            assert abs(g["score"] - score) < 1e-9, f"q{qid} doc {doc}"


def test_wand_equals_exhaustive(spark, built):
    queries = gen_queries(30, seed=SEED)
    queries = queries[queries["mode"] == "OR"]
    a = search(spark, built, queries, kernel="wand").collect()
    b = search(spark, built, queries, kernel="exhaustive").collect()
    key = lambda r: (r["query_id"], r["rank"])
    a, b = sorted(a, key=key), sorted(b, key=key)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        assert (x["query_id"], x["rank"], x["doc_id"]) == (y["query_id"], y["rank"], y["doc_id"])
        assert abs(x["score"] - y["score"]) < 1e-9


def test_and_subset_of_or(spark, built):
    queries = gen_queries(20, seed=SEED)
    qand = queries.copy()
    qand["mode"] = "AND"
    qand["k"] = 10_000
    qor = queries.copy()
    qor["mode"] = "OR"
    qor["k"] = 10_000
    a = search(spark, built, qand).collect()
    o = search(spark, built, qor).collect()
    aset, oset = {}, {}
    for r in a:
        aset.setdefault(r["query_id"], set()).add(r["doc_id"])
    for r in o:
        oset.setdefault(r["query_id"], set()).add(r["doc_id"])
    for qid, docs in aset.items():
        assert docs <= oset.get(qid, set())


def test_partition_count_invariance(spark, tmp_path_factory):
    """Index built from 1-partition input == index from 8-partition input
    (merge correctness, FIXTURES.md invariant 2)."""
    p1 = gen_pages_spark(spark, 120, seed=SEED, partitions=1)
    p8 = gen_pages_spark(spark, 120, seed=SEED, partitions=8)
    cfg = EngineConfig(shard_size=32, block_size=8, build_partitions=4)
    out1 = str(tmp_path_factory.mktemp("idx1"))
    out8 = str(tmp_path_factory.mktemp("idx8"))
    build_index(spark, p1, out1, cfg)
    build_index(spark, p8, out8, cfg)
    i1, i8 = load_index(spark, out1), load_index(spark, out8)
    assert i1.stats == i8.stats
    cols = ["term_id", "shard", "df_shard", "doc_blob", "tf_blob"]
    r1 = sorted(i1.postings.select(cols).collect())
    r8 = sorted(i8.postings.select(cols).collect())
    assert r1 == r8


def test_spark_generator_matches_pandas(spark):
    got = (
        gen_pages_spark(spark, 50, seed=SEED, partitions=4)
        .orderBy("url")
        .toPandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    want = gen_pages_pandas(50, seed=SEED).sort_values("url").reset_index(drop=True)
    assert (got["text"] == want["text"]).all()
    assert (got["lang"] == want["lang"]).all()
    assert [bytes(b) for b in got["html"]] == [bytes(b) for b in want["html"]]


def test_df_sum_invariant(built, oracle):
    """FIXTURES.md §6: Σ df over terms == #distinct (term, doc) pairs."""
    total_df = built.terms.agg(F.sum("df")).collect()[0][0]
    expect = sum(len(p) for p in oracle.postings.values())
    assert total_df == expect


def test_block_metadata_consistency(built):
    """Every posting row's block arrays agree in length and bound df_shard."""
    rows = built.postings.limit(200).collect()
    for r in rows:
        nb = len(r["block_last"])
        assert nb == len(r["block_doc_off"]) == len(r["block_max_tf"]) == len(r["block_min_dl"])
        assert nb == (r["df_shard"] + CFG.block_size - 1) // CFG.block_size
        last = list(r["block_last"])
        assert last == sorted(last)


def test_observed_build_metrics(built, oracle, tmp_path_factory):
    """A6/A7: docs/postings counters come from observe() on the build job's
    own actions and land in the manifest."""
    import json
    import os

    # the `built` fixture's index dir
    root = built.paths.root
    with open(os.path.join(root, "manifest.json")) as f:
        manifest = json.load(f)
    obs = manifest["observed"]
    assert obs["n_docs"] == oracle.N == manifest["docs_indexed_this_run"]
    total_postings = sum(len(p) for p in oracle.postings.values())
    assert obs["n_postings"] == total_postings
    assert obs["posting_rows"] >= len(oracle.postings)  # ≥ one row per term
    assert obs["postings_per_partition"] > 0
    assert manifest["docs_per_sec_this_run"] > 0


def test_build_dedup_exact_equals_prededuped_build(spark, tmp_path):
    """build_index(dedup_exact=True) over a corpus with exact duplicates is
    byte-identical to building over the manually pre-deduplicated corpus
    (smallest url per text wins, deterministically)."""
    import pandas as pd

    from invoicenet_spark.index.build import IndexPaths, build_index, read_postings
    from invoicenet_spark.query.exec import load_index

    base = [(f"{i:012d}", f"doc number {i} some words {i % 7}") for i in range(40)]
    dups = [(f"{i + 100:012d}", base[i][1]) for i in range(0, 40, 3)]  # bigger urls
    rows = base + dups
    pages = spark.createDataFrame(
        [(u, None, None, t, "en") for u, t in rows],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    cfg = EngineConfig(shard_size=32, block_size=8, build_partitions=4)
    root_d = str(tmp_path / "dedup")
    build_index(spark, pages, root_d, cfg, use_stored_text=True, dedup_exact=True)

    manual = spark.createDataFrame(
        [(u, None, None, t, "en") for u, t in base],  # base urls are the min per text
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    root_m = str(tmp_path / "manual")
    build_index(spark, manual, root_m, cfg, use_stored_text=True)

    idx_d, idx_m = load_index(spark, root_d), load_index(spark, root_m)
    assert idx_d.N == idx_m.N == len(base)
    a = read_postings(spark, IndexPaths(root_d)).toPandas().sort_values(
        ["term_id", "shard"]).reset_index(drop=True)
    b = read_postings(spark, IndexPaths(root_m)).toPandas().sort_values(
        ["term_id", "shard"]).reset_index(drop=True)
    assert len(a) == len(b) > 0
    for c in ("doc_blob", "tf_blob", "dl_blob"):
        assert all(bytes(x) == bytes(y) for x, y in zip(a[c], b[c])), c
