"""Query execution: the `predict.py` path (SURVEY.md §3.2), Spark-first.

Plan shape for a batch of queries:

  queries(query_id, terms, mode, k)
    explode → (query_id, term)                      [tiny]
    ⋈ broadcast terms-dictionary → idf per term     [broadcast hash join]
    ⋈ postings on term                              [pushed-down term filter]
    ⋈ broadcast shard doc_len arrays                [per-shard forward index]
    groupBy(query_id, shard) applyInPandas kernel   [WAND / gallop / exhaustive]
    window top-k by (score desc, doc_id asc)        [global merge, tiny]
    ⋈ docs → url                                    [result materialization]

Every (query_id, shard) task is independent — the shard axis is the same
docID-range partitioning the build used, so cross-shard skew cannot occur
and the global merge touches only per-shard top-k rows (≤ k · n_shards).

The term filter (`postings.term IN (...)`) reaches the parquet scan as a
pushed filter; postings files are laid out sorted by term within each shard
so row-group min/max statistics skip non-matching row groups — the Iceberg
metadata-pruning analog under the plain-parquet fallback.
"""

from __future__ import annotations

import json
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from invoicenet_spark.index import bm25
from invoicenet_spark.index.build import IndexPaths
from invoicenet_spark.query import kernels


@dataclass
class Index:
    paths: IndexPaths
    postings: DataFrame
    terms: DataFrame
    docs: DataFrame
    stats: dict

    @property
    def N(self) -> int:
        return self.stats["N"]

    @property
    def avgdl(self) -> float:
        return self.stats["avgdl"]


def load_index(spark: SparkSession, root: str) -> Index:
    paths = IndexPaths(root)
    with open(paths.stats) as f:
        stats = json.load(f)
    return Index(
        paths=paths,
        postings=spark.read.parquet(paths.postings),
        terms=spark.read.parquet(paths.terms),
        docs=spark.read.parquet(paths.docs),
        stats=stats,
    )


def shard_doc_lens(index: Index) -> DataFrame:
    """Forward index: per shard, a positional doc_len array indexed by
    (doc_id - shard*shard_size). Built by scatter (not sort-collect) because
    incremental builds align new docIDs to shard boundaries, which can leave
    holes in a shard's occupancy; holes get doc_len 0 (never referenced — no
    posting points at a missing doc)."""
    shard_size = index.stats["shard_size"]
    rows = index.docs.select(
        "shard", (F.col("doc_id") % shard_size).alias("off"), "doc_len"
    )

    def scatter(key, pdf: pd.DataFrame) -> pd.DataFrame:
        offs = pdf["off"].to_numpy()
        size = int(offs.max()) + 1
        arr = np.zeros(size, dtype=np.int64)
        arr[offs] = pdf["doc_len"].to_numpy()
        return pd.DataFrame({"shard": [int(key[0])], "doc_lens": [arr.tolist()]})

    return rows.groupBy("shard").applyInPandas(
        scatter, schema="shard long, doc_lens array<long>"
    )


RESULT_SCHEMA = "query_id long, doc_id long, score double"


def _shard_kernel(stats: dict, kernel: str):
    """applyInPandas body for one (query_id, shard) group."""
    k1, b = stats["k1"], stats["b"]
    avgdl, N = stats["avgdl"], stats["N"]
    shard_size = stats["shard_size"]

    def run(key, pdf: pd.DataFrame) -> pd.DataFrame:
        query_id, shard = int(key[0]), int(key[1])
        pdf = pdf.sort_values("term_id").reset_index(drop=True)  # deterministic accumulation
        mode = pdf["mode"].iloc[0]
        k = int(pdf["k"].iloc[0])
        n_query_terms = int(pdf["n_query_terms"].iloc[0])
        if mode == "AND" and pdf["term_id"].nunique() < n_query_terms:
            return pd.DataFrame({"query_id": [], "doc_id": [], "score": []}).astype(
                {"query_id": np.int64, "doc_id": np.int64, "score": np.float64}
            )
        doc_lens = np.asarray(pdf["doc_lens"].iloc[0], dtype=np.int64)
        shard_base = shard * shard_size
        plists = [
            kernels.TermPostings(row, idf=row["idf"], avgdl=avgdl, k1=k1, b=b)
            for row in pdf.to_dict("records")
        ]
        if mode == "AND" or kernel == "exhaustive":
            docs, scores = kernels.score_exhaustive(plists, doc_lens, shard_base, k, mode)
        elif kernel == "wand":
            docs, scores = kernels.score_wand(plists, doc_lens, shard_base, k)
        else:  # auto: WAND pays off on long lists, exhaustive on short
            total = int(pdf["df_shard"].sum())
            if total <= 4096:
                docs, scores = kernels.score_exhaustive(plists, doc_lens, shard_base, k, mode)
            else:
                docs, scores = kernels.score_wand(plists, doc_lens, shard_base, k)
        return pd.DataFrame(
            {"query_id": np.full(docs.size, query_id, dtype=np.int64),
             "doc_id": docs.astype(np.int64),
             "score": scores.astype(np.float64)}
        )

    return run


def search(
    spark: SparkSession,
    index: Index,
    queries: pd.DataFrame | DataFrame,
    kernel: str = "auto",
    with_url: bool = True,
) -> DataFrame:
    """Batch top-k search. queries: (query_id, terms array<string>, mode, k).

    Returns (query_id, rank, doc_id, score[, url]) sorted by query_id, rank.
    """
    if isinstance(queries, pd.DataFrame):
        qdf = spark.createDataFrame(queries)
    else:
        qdf = queries
    qterms = qdf.select(
        "query_id",
        "mode",
        "k",
        F.size(F.array_distinct("terms")).alias("n_query_terms"),
        F.explode(F.array_distinct("terms")).alias("term"),
    )

    # dictionary lookup: term → (term_id, df). Query side is tiny →
    # broadcast it into the dictionary scan; the semi-join prunes the read.
    t = index.terms.join(F.broadcast(qterms.select("term").distinct()), "term")
    N = index.N
    t = t.withColumn(
        "idf", F.log((F.lit(N) - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5)) + F.lit(1.0))
    )

    q = qterms.join(F.broadcast(t.select("term", "term_id", "idf")), "term")
    # postings probe on term_id: the IN-filter pushes into the parquet scan
    # and row-group min/max stats on the term_id-sorted files skip segments
    cand = index.postings.join(F.broadcast(q.drop("term")), "term_id")
    # forward-index join: candidate rows are few (queries × terms × shards),
    # doc_lens arrays are corpus-sized — never broadcast the array side; AQE
    # picks the strategy (at small SF it broadcasts cand into doclens)
    cand = cand.join(shard_doc_lens(index), "shard")

    out = cand.groupBy("query_id", "shard").applyInPandas(
        _shard_kernel(index.stats, kernel), schema=RESULT_SCHEMA
    )

    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("doc_id").asc())
    topk = (
        out.withColumn("rank", F.row_number().over(w))
        .join(qdf.select("query_id", "k"), "query_id")
        .where(F.col("rank") <= F.col("k"))
        .select("query_id", "rank", "doc_id", "score")
    )
    if with_url:
        topk = topk.join(index.docs.select("doc_id", "url"), "doc_id", "left").select(
            "query_id", "rank", "doc_id", "url", "score"
        )
    return topk.orderBy("query_id", "rank")
