"""Round-6 probe #4: interleaved A/B of the old (pairs-aggregation, no token
cache) vs new (cached analyzed tokens, token-stream encode) build pipelines,
same session, alternating reps — the only reliable instrument on this VM
(cross-run swings are 3x)."""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import invoicenet_spark.index.build as B
from invoicenet_spark.config import EngineConfig
from invoicenet_spark.fixtures import gen_pages_spark
from invoicenet_spark.session import get_spark

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_DOCS = int(os.environ.get("BENCH_DOCS", "100000"))


def build_old(spark, pages, out_dir, cfg):
    """Round-5 orchestration: no analyzed cache; _encode_and_commit sees no
    `_toks` column and takes the pairs-aggregation path."""
    paths = B.IndexPaths(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    manifest = {"config": B._cfg_dict(cfg)}
    log = B.ShardLog(out_dir)
    pages_text = B.tokens_from_pages(pages, cfg)
    t0 = time.time()
    B.build_doc_table(pages_text, cfg).withColumn(
        "segment", F.lit("base")
    ).write.mode("overwrite").partitionBy("segment").parquet(paths.docs)
    docs = spark.read.parquet(paths.docs)
    manifest["phase1_sec"] = round(time.time() - t0, 3)
    docs = docs.withColumn("shard", (F.col("doc_id") / F.lit(cfg.shard_size)).cast("long"))
    all_shards = sorted(int(r["shard"]) for r in docs.select("shard").distinct().collect())
    t0 = time.time()
    docs_pending = docs.where(F.col("shard").isin(all_shards))
    observed = B._encode_and_commit(spark, pages_text, docs_pending, all_shards, cfg, paths, log)
    B._finalize(spark, docs, cfg, paths, manifest, log, t0, observed)
    return paths


def main():
    spark = get_spark("r06_probe4", cores=CPUS, shuffle_partitions=CPUS, driver_memory="48g")
    sc = spark.sparkContext
    cfg = EngineConfig(shard_size=1 << 14, block_size=128, build_partitions=CPUS)
    pages_path = os.path.join(tempfile.gettempdir(), "probe_pages")
    if not os.path.exists(os.path.join(pages_path, "_SUCCESS")):
        gen_pages_spark(spark, N_DOCS, seed=42, partitions=CPUS).write.mode(
            "overwrite"
        ).parquet(pages_path)
    pages = spark.read.parquet(pages_path)

    def one(kind):
        out = os.path.join(tempfile.mkdtemp(prefix=f"ab_{kind}_"), "index")
        sc.setJobDescription(f"build_{kind}")
        t0 = time.perf_counter()
        if kind == "old":
            build_old(spark, pages, out, cfg)
        else:
            B.build_index(spark, pages, out, cfg)
        dt = round(time.perf_counter() - t0, 2)
        import json

        with open(os.path.join(out, "manifest.json")) as f:
            m = json.load(f)
        shutil.rmtree(os.path.dirname(out), ignore_errors=True)
        return dt, m.get("phase1_sec"), m.get("phase2_sec")

    one("old"); one("new")  # warmup both paths
    olds, news = [], []
    for i in range(4):
        o = one("old"); n = one("new")
        olds.append(o); news.append(n)
        print(f"rep{i}: old={o} new={n}", flush=True)
    med = lambda xs: sorted(x[0] for x in xs)[len(xs) // 2]
    print("median old:", med(olds), "median new:", med(news), flush=True)


if __name__ == "__main__":
    main()
