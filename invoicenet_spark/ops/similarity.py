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
) -> DataFrame:
    """ANN: probe the query's hyperplane bucket, exact re-rank inside it.

    Recall < 1 by construction (single probe); use multiple tables or lower
    n_planes for higher recall. Returned schema matches brute_force_topk.
    """
    dim = len(query_vec)
    sig = hyperplane_signature_udf(dim, n_planes, seed)
    planes = np.random.default_rng(seed).standard_normal((dim, n_planes))
    qsig = 0
    proj = np.asarray(query_vec, dtype=np.float64) @ planes
    for i in range(n_planes):
        if proj[i] > 0:
            qsig |= 1 << i
    bucketed = embeddings.withColumn("bucket", sig(F.col(vec_col)))
    cand = bucketed.where(F.col("bucket") == qsig)
    return brute_force_topk(cand, query_vec, k, id_col, vec_col)
