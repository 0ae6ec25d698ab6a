"""Capture .explain('formatted') for the bench operator queries into
plans/r06/<query>_{before,after}.txt. Run once with the round-5 tree on
sys.path (suffix 'before') and once with the current tree ('after').

    python tools/r06_plans.py <repo_root> <suffix> <out_dir>
"""

from __future__ import annotations

import os
import sys

repo_root, suffix, out_dir = sys.argv[1], sys.argv[2], sys.argv[3]
sys.path.insert(0, repo_root)

from invoicenet_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
os.makedirs(out_dir, exist_ok=True)

spark = get_spark("r06_plans", cores=8, shuffle_partitions=8)

from invoicenet_spark import entrypoints  # noqa: E402

NAMES = [
    "term_counts",
    "doc_freq",
    "dedup_exact",
    "jaccard_pairs",
    "minhash_lsh",
    "simhash",
    "ann_cosine_topk",
    "lang_id",
    "quality_score",
    "tpch_q1",
    "events_window",
]

for name in NAMES:
    df = entrypoints.QUERIES[name](spark, SF_DIR)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
        f.write(plan)
    print("wrote", name, suffix, flush=True)

# index-build encode pipeline plan (the dataframe written in phase 2)
import tempfile  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402

import invoicenet_spark.index.build as B  # noqa: E402
from invoicenet_spark.config import EngineConfig  # noqa: E402
from invoicenet_spark.fixtures import gen_pages_spark  # noqa: E402
from invoicenet_spark.functions.analyzer import analyze_col  # noqa: E402

cfg = EngineConfig(shard_size=1 << 14, block_size=128, build_partitions=8)
pages = gen_pages_spark(spark, 2000, seed=42, partitions=8)
root = tempfile.mkdtemp(prefix="plan_idx_")
out = os.path.join(root, "index")
os.makedirs(out, exist_ok=True)
paths = B.IndexPaths(out)
pages_text = B.tokens_from_pages(pages, cfg)
if suffix == "after" and not cfg.fields:
    from pyspark.storagelevel import StorageLevel

    pages_text = pages_text.select(
        "url", "warc_ts", analyze_col("text").alias("_toks")
    ).persist(StorageLevel.MEMORY_AND_DISK)
B.build_doc_table(pages_text, cfg).withColumn("segment", F.lit("base")).write.mode(
    "overwrite"
).partitionBy("segment").parquet(paths.docs)
docs = spark.read.parquet(paths.docs)
src = pages_text.join(docs.select("url", "doc_id", "doc_len"), "url")
if suffix == "after":
    tokens = src.select(
        F.explode(F.col("_toks")).alias("term"),
        "doc_id",
        F.col("doc_len").cast("int").alias("doc_len"),
    )
else:
    tokens = src.select(
        F.explode(analyze_col("text")).alias("term"),
        "doc_id",
        F.col("doc_len").cast("int").alias("doc_len"),
    )
term_dict = B._term_dictionary(spark, tokens if suffix == "after" else tokens.groupBy(
    "term", "doc_id", "doc_len").agg(F.count("*").alias("tf")), cfg, paths)
shard_expr = (F.col("doc_id") / F.lit(cfg.shard_size)).cast("long")
if suffix == "after":
    enc_input = tokens.join(term_dict, "term").select("term_id", "doc_id", "doc_len")
else:
    pairs = tokens.groupBy("term", "doc_id", "doc_len").agg(F.count("*").alias("tf"))
    enc_input = pairs.join(term_dict, "term").select(
        "term_id", "doc_id", "doc_len", "tf"
    )
encoded = (
    enc_input.repartitionByRange(cfg.build_partitions, F.col("term_id"), shard_expr)
    .sortWithinPartitions("term_id", "doc_id")
    .mapInArrow(
        lambda it: B._encode_partition(it, cfg.block_size, cfg.shard_size),
        schema=B.POSTINGS_SCHEMA,
    )
)
plan = encoded._jdf.queryExecution().explainString(
    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
)
with open(os.path.join(out_dir, f"index_build_encode_{suffix}.txt"), "w") as f:
    f.write(plan)
print("wrote index_build_encode", suffix, flush=True)
import shutil  # noqa: E402

shutil.rmtree(root, ignore_errors=True)
