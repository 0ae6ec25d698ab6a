"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: build the full-text inverted index over the
synthetic Common-Crawl-style `pages` corpus and answer the reference query
set with BM25 top-k (the north_rule pipeline), returning the result frame.

``queries()`` / ``oracle_sql()`` — SURVEY.md §2 operators expressed over the
driver testdata at sf_dir (tables: documents, embeddings, lineitem, orders,
…), each with a DuckDB-checkable ANSI-SQL oracle. Column names are aliased
identically on both sides (driver hashes values after sorting by column
name).
"""

from __future__ import annotations

import os
import sys
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: index 400 synthetic pages end-to-end, run 20 reference
    queries, return (query_id, rank, doc_id, url, score)."""
    from invoicenet_spark.config import EngineConfig
    from invoicenet_spark.fixtures import gen_pages_spark, gen_queries
    from invoicenet_spark.index.build import build_index
    from invoicenet_spark.query.exec import load_index, search

    cfg = EngineConfig(shard_size=128, block_size=32, build_partitions=8)
    pages = gen_pages_spark(spark, 400, seed=42, partitions=8)
    out = os.path.join(tempfile.mkdtemp(prefix="invoicenet_spark_"), "index")
    build_index(spark, pages, out, cfg)
    index = load_index(spark, out)
    return search(spark, index, gen_queries(20, seed=42), kernel="auto")


# --------------------------------------------------------------------------
# Shared SQL fragments: analyzer semantics must match invoicenet_spark
# (lowercase, split on non-alphanumeric runs, drop empties) — see
# invoicenet_spark/functions/analyzer.py.
_DUCK_TOKENS = (
    "SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),"
    " t -> t <> '')) AS term FROM documents"
)


def _spark_tokens(spark: SparkSession, sf_dir: str):
    from pyspark.sql import functions as F

    from invoicenet_spark.functions.analyzer import tokens_col

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select("doc_id", F.explode(tokens_col("text")).alias("term"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from invoicenet_spark import entrypoints

    return entrypoints.QUERIES


def oracle_sql() -> dict[str, str]:
    from invoicenet_spark import entrypoints

    return entrypoints.ORACLE_SQL
