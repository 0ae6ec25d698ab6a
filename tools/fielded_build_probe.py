"""Price the fielded-index build (round-5 item 8): same corpus, built as a
single-field index vs a (title, body) BM25F index — wall time, posting
rows, dictionary size, on-disk bytes, so users can see the posting-size
multiplier field-qualified dictionary keys cost.

The corpus is the synthetic fixture text split deterministically: first 8
tokens → title, rest → body; the single-field twin indexes the identical
token stream as one field. Writes BENCH/FIELDED_BUILD.json.

Usage: python tools/fielded_build_probe.py [--docs 100000] [--reps 3]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def du(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=100_000)
    ap.add_argument("--cores", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from invoicenet_spark.config import EngineConfig
    from invoicenet_spark.fixtures import gen_pages_spark
    from invoicenet_spark.index.build import build_index
    from invoicenet_spark.session import get_spark

    spark = get_spark("fielded_build_probe", cores=args.cores,
                      shuffle_partitions=args.cores, driver_memory="48g")

    base = gen_pages_spark(spark, args.docs, seed=42, partitions=args.cores).select(
        "url", "lang",
        F.array_join(F.slice(F.split("text", " "), 1, 8), " ").alias("title"),
        F.array_join(
            F.slice(F.split("text", " "), 9, 1 << 20), " "
        ).alias("body"),
    )
    src = os.path.join(tempfile.gettempdir(), "fielded_probe_pages")
    base.write.mode("overwrite").parquet(src)
    pages = spark.read.parquet(src)

    def timed_build(cfg, frame):
        times = []
        root = None
        for _ in range(args.reps):
            if root:
                shutil.rmtree(os.path.dirname(root), ignore_errors=True)
            root = os.path.join(tempfile.mkdtemp(prefix="fbp_"), "index")
            t0 = time.perf_counter()
            build_index(spark, frame, root, cfg, use_stored_text=True)
            times.append(time.perf_counter() - t0)
        times.sort()
        return times[len(times) // 2], root

    cpus = args.cores
    single_pages = pages.select(
        "url", "lang", F.concat_ws(" ", "title", "body").alias("text")
    )
    t_single, r_single = timed_build(
        EngineConfig(shard_size=1 << 14, block_size=128, build_partitions=cpus),
        single_pages,
    )
    t_fielded, r_fielded = timed_build(
        EngineConfig(shard_size=1 << 14, block_size=128, build_partitions=cpus,
                     fields=("title", "body")),
        pages,
    )

    def stats(root):
        post = spark.read.parquet(os.path.join(root, "postings"))
        terms = spark.read.parquet(os.path.join(root, "terms"))
        return {
            "posting_rows": post.count(),
            "dict_terms": terms.count(),
            "index_bytes": du(root),
        }

    out = {
        "docs": args.docs,
        "cores": cpus,
        "reps": args.reps,
        "single_field": {"build_sec": round(t_single, 2), **stats(r_single)},
        "fielded_title_body": {"build_sec": round(t_fielded, 2), **stats(r_fielded)},
    }
    s, f = out["single_field"], out["fielded_title_body"]
    out["multipliers"] = {
        "build_time": round(f["build_sec"] / s["build_sec"], 3),
        "posting_rows": round(f["posting_rows"] / s["posting_rows"], 3),
        "dict_terms": round(f["dict_terms"] / s["dict_terms"], 3),
        "index_bytes": round(f["index_bytes"] / s["index_bytes"], 3),
    }
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "BENCH", "FIELDED_BUILD.json")
    with open(path, "w") as fjson:
        json.dump(out, fjson, indent=2)
    print(json.dumps(out, indent=2))
    shutil.rmtree(os.path.dirname(r_single), ignore_errors=True)
    shutil.rmtree(os.path.dirname(r_fielded), ignore_errors=True)


if __name__ == "__main__":
    main()
