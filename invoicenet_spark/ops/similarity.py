"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: the exact baseline. Dot products via JVM
  `F.zip_with` + `F.aggregate` in float64 — no Python in the loop.
- LSH-bucketed ANN: random-hyperplane signatures (seeded, deterministic)
  computed in a vectorized pandas UDF (one matmul per Arrow batch); probe =
  same-bucket candidates then exact re-rank. The scale path: candidates per
  query ∝ bucket occupancy, not corpus size.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import LongType


def cosine_col(a, b):
    """float64 cosine between two array<float> columns, JVM-side."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )
    nb = F.sqrt(
        F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )
    return dot / (na * nb)


def brute_force_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine to one query vector. Ties → lower id first."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = embeddings.select(
        id_col, cosine_col(F.col(vec_col), q).alias("cos")
    )
    return (
        scored.orderBy(F.col("cos").desc(), F.col(id_col).asc())
        .limit(k)
        .select(id_col, F.round("cos", 6).alias("cos_r6"))
    )


def hyperplane_signature_udf(dim: int, n_planes: int = 16, seed: int = 7):
    """Vectorized pandas UDF: embedding → LSH bucket id (sign pattern of
    n_planes random projections). One matmul per Arrow batch."""
    planes = np.random.default_rng(seed).standard_normal((dim, n_planes))

    @F.pandas_udf(LongType())
    def sig(v: pd.Series) -> pd.Series:
        mat = np.stack(v.to_numpy())  # (batch, dim)
        proj = mat.astype(np.float64) @ planes  # (batch, n_planes)
        bits = (proj > 0).astype(np.uint64)
        out = np.zeros(len(v), dtype=np.uint64)
        for i in range(n_planes):
            out |= bits[:, i] << np.uint64(i)
        return pd.Series(out.astype(np.int64))

    return sig


def lsh_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 12,
    seed: int = 7,
    n_probes: int = 1,
) -> DataFrame:
    """ANN over an un-indexed frame: compute buckets on the fly, probe the
    query's bucket (+ multi-probe flips), exact re-rank inside.

    For repeated queries use build_ann_index/lsh_topk_indexed — buckets are
    then PERSISTED as a partition column and each query reads only its
    probed buckets' files (partition pruning) instead of recomputing
    signatures over the whole corpus. Returned schema matches
    brute_force_topk.
    """
    dim = len(query_vec)
    sig = hyperplane_signature_udf(dim, n_planes, seed)
    buckets = query_buckets(query_vec, n_planes, seed, n_probes)
    bucketed = embeddings.withColumn("bucket", sig(F.col(vec_col)))
    cand = bucketed.where(F.col("bucket").isin(buckets))
    return brute_force_topk(cand, query_vec, k, id_col, vec_col)


def query_buckets(
    query_vec: list[float], n_planes: int, seed: int, n_probes: int = 1
) -> list[int]:
    """Query bucket + multi-probe neighbors: flip the bits whose hyperplane
    the query sits closest to (smallest |projection| = most likely to have
    split near-neighbors away), one flip per extra probe."""
    planes = np.random.default_rng(seed).standard_normal((len(query_vec), n_planes))
    proj = np.asarray(query_vec, dtype=np.float64) @ planes
    qsig = 0
    for i in range(n_planes):
        if proj[i] > 0:
            qsig |= 1 << i
    flips = np.argsort(np.abs(proj), kind="stable")
    return [qsig] + [int(qsig ^ (1 << int(i))) for i in flips[: max(0, n_probes - 1)]]


def build_ann_index(
    embeddings: DataFrame,
    out_dir: str,
    n_planes: int = 12,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Persist the corpus partitioned by hyperplane bucket.

    The signature pass runs ONCE at build time (one matmul per Arrow batch);
    queries then touch only the probed buckets' parquet directories — scan
    cost ∝ bucket occupancy, not corpus size, enforced by the planner's
    partition pruning (PartitionFilters on `bucket`)."""
    import json
    import os

    dim = len(embeddings.select(vec_col).first()[0])
    sig = hyperplane_signature_udf(dim, n_planes, seed)
    (
        embeddings.withColumn("bucket", sig(F.col(vec_col)))
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(os.path.join(out_dir, "vectors"))
    )
    with open(os.path.join(out_dir, "ann_meta.json"), "w") as f:
        json.dump({"n_planes": n_planes, "seed": seed, "dim": dim,
                   "id_col": id_col, "vec_col": vec_col}, f)


def lsh_topk_indexed(
    spark,
    index_dir: str,
    query_vec: list[float],
    k: int = 10,
    n_probes: int = 4,
) -> DataFrame:
    """ANN over a persisted bucket-partitioned index: bucket IN (...) reaches
    the scan as a partition filter, so only the probed directories are read.
    Multi-probe (default 4) recovers most of the single-probe recall loss."""
    import json
    import os

    with open(os.path.join(index_dir, "ann_meta.json")) as f:
        meta = json.load(f)
    buckets = query_buckets(query_vec, meta["n_planes"], meta["seed"], n_probes)
    df = spark.read.parquet(os.path.join(index_dir, "vectors")).where(
        F.col("bucket").isin(buckets)
    )
    return brute_force_topk(df, query_vec, k, meta["id_col"], meta["vec_col"])
