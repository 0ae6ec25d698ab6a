"""Round-6 probe #2: decompose minhash_lsh / jaccard_pairs at scale, and
try join-strategy configs (guide §3.1)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from invoicenet_spark.ops.dedup import (
    jaccard_pairs,
    minhash_lsh_candidates,
    minhash_signatures,
    shingles_df,
)
from invoicenet_spark.session import get_spark

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def t(fn, reps=2):
    fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        r = fn()
        ts.append(time.perf_counter() - t0)
    return round(min(ts), 3), r


def main(sf_dir):
    extra = {}
    if os.environ.get("PROBE_SHJ") == "1":
        extra["spark.sql.join.preferSortMergeJoin"] = "false"
    spark = get_spark("r06_probe2", cores=CPUS, shuffle_partitions=CPUS, extra_conf=extra)
    sc = spark.sparkContext
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))

    sc.setJobDescription("shingles")
    print("shingles_count", t(lambda: shingles_df(docs).count()), flush=True)

    sc.setJobDescription("sig")
    print("minhash_sig", t(lambda: minhash_signatures(docs).count()), flush=True)

    sc.setJobDescription("cand")
    print("lsh_candidates", t(lambda: minhash_lsh_candidates(docs).count()), flush=True)

    cand = minhash_lsh_candidates(docs)
    sc.setJobDescription("verify")
    print(
        "verify_given_cand",
        t(lambda: jaccard_pairs(docs, threshold=0.12, candidates=cand).count()),
        flush=True,
    )

    # jaccard decomposition
    sh = shingles_df(docs)
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, F.col("a.shingle") == F.col("b.shingle"))
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    sc.setJobDescription("inter")
    print("jaccard_inter", t(lambda: inter.count()), flush=True)
    sc.setJobDescription("jaccard_full")
    print("jaccard_full", t(lambda: jaccard_pairs(docs, threshold=0.12).count()), flush=True)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/scaledata/sf1sim")
