"""Round-6 probe #3: array_intersect candidate verification + join-strategy
configs for the all-pairs jaccard."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from invoicenet_spark.ops.dedup import (
    jaccard_pairs,
    minhash_lsh_candidates,
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


def verify_v2(df, candidates, text_col="text", key_col="doc_id", n=3, threshold=0.12):
    """Per-pair set intersection: each candidate pair joins its two docs'
    shingle-set ARRAYS (collect once per doc) and intersects in the JVM —
    no exploded pair×shingle rows, no pair-count aggregation."""
    ids = (
        candidates.select(F.col("id_a").alias(key_col))
        .union(candidates.select(F.col("id_b").alias(key_col)))
        .distinct()
    )
    sub = df.join(F.broadcast(ids), key_col, "leftsemi")
    sh = shingles_df(sub, text_col, key_col, n)
    sets = sh.groupBy(key_col).agg(F.collect_list("shingle").alias("ss"))
    sa = sets.select(F.col(key_col).alias("id_a"), F.col("ss").alias("sa"))
    sb = sets.select(F.col(key_col).alias("id_b"), F.col("ss").alias("sb"))
    out = (
        candidates.select("id_a", "id_b").distinct()
        .join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.size(F.array_intersect("sa", "sb")).alias("n_inter"),
            F.size("sa").alias("n_a"),
            F.size("sb").alias("n_b"),
        )
        .where(F.col("n_inter") > 0)
        .withColumn(
            "jaccard",
            (F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))).cast("double"),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )
    return out


def main(sf_dir):
    extra = {}
    if os.environ.get("PROBE_SHJ") == "1":
        extra["spark.sql.join.preferSortMergeJoin"] = "false"
    if os.environ.get("PROBE_ZSTD") == "1":
        extra["spark.io.compression.codec"] = "zstd"
    spark = get_spark("r06_probe3", cores=CPUS, shuffle_partitions=CPUS, extra_conf=extra)
    sc = spark.sparkContext
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))

    cand = minhash_lsh_candidates(docs)

    sc.setJobDescription("verify_cur")
    print("verify_cur", t(lambda: jaccard_pairs(docs, threshold=0.12, candidates=cand).count()), flush=True)
    sc.setJobDescription("verify_v2")
    print("verify_v2", t(lambda: verify_v2(docs, cand).count()), flush=True)

    ra = sorted(map(tuple, jaccard_pairs(docs, threshold=0.12, candidates=cand).collect()))
    rb = sorted(map(tuple, verify_v2(docs, cand).collect()))
    print("eq verify:", ra == rb, len(ra), flush=True)

    sc.setJobDescription("jaccard_inter")
    sh = shingles_df(docs)
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, F.col("a.shingle") == F.col("b.shingle"))
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    print("jaccard_inter", t(lambda: inter.count()), flush=True)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/scaledata/sf1sim")
