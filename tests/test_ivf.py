"""IVF ANN (coarse-quantizer cells) — ops/similarity.py.

Contract pins:
- cells PARTITION the corpus: every vector in exactly one cell, so a
  full probe (n_probes == n_centroids) is exact cosine by construction;
- the cell predicate reaches the scan as a partition filter (probed-cell
  scan cost, not corpus scan);
- the persisted index runs the same math as the numpy twin the recall
  curve measures (assign_cells_numpy / ivf_probe_cells parity);
- builds are deterministic (seeded sample sort + seeded k-means);
- recall floor in the planted near-dup regime (the use case ANN exists
  for — raw synthetic embeddings are near-uniform on the sphere, see
  spark-graft ANN notes in BENCH/BASELINE.md).
"""

import os

import numpy as np
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from invoicenet_spark.ops.similarity import (
    assign_cells_numpy,
    brute_force_topk,
    build_ivf_index,
    ivf_probe_cells,
    ivf_recall_curve,
    ivf_topk,
    kmeans_centroids,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))


@pytest.fixture(scope="module")
def ivf_root(spark, emb, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ivf") / "idx")
    build_ivf_index(emb, root, n_centroids=16, seed=7)
    return root


def _meta(root):
    import json

    with open(os.path.join(root, "ivf_meta.json")) as f:
        return json.load(f)


def test_cells_partition_the_corpus(spark, emb, ivf_root):
    n = emb.count()
    vec = spark.read.parquet(os.path.join(ivf_root, "vectors"))
    assert vec.count() == n
    assert vec.select("vec_id").distinct().count() == n  # once each


def test_full_probe_is_exact(spark, emb, ivf_root):
    meta = _meta(ivf_root)
    qvec = [float(x) for x in emb.where(F.col("vec_id") == 3).first()["embedding"]]
    exact = brute_force_topk(emb, qvec, k=10).toPandas()
    got = ivf_topk(spark, ivf_root, qvec, k=10, n_probes=meta["n_centroids"]).toPandas()
    assert list(got["vec_id"]) == list(exact["vec_id"])
    assert list(got["cos_r6"]) == list(exact["cos_r6"])


def test_cell_predicate_is_partition_filter(spark, emb, ivf_root):
    qvec = [float(x) for x in emb.where(F.col("vec_id") == 3).first()["embedding"]]
    plan = ivf_topk(spark, ivf_root, qvec, k=5, n_probes=2)._jdf.queryExecution(
    ).executedPlan().toString()
    scan = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert scan and any("cell" in ln for ln in scan), plan


def test_persisted_assignments_match_numpy_twin(spark, ivf_root):
    meta = _meta(ivf_root)
    centroids = np.asarray(meta["centroids"], dtype=np.float64)
    vec = (
        spark.read.parquet(os.path.join(ivf_root, "vectors"))
        .select("vec_id", "embedding", "cell")
        .toPandas()
        .sort_values("vec_id")
    )
    mat = np.stack(vec["embedding"].to_numpy()).astype(np.float64)
    assert np.array_equal(
        vec["cell"].to_numpy().astype(np.int64), assign_cells_numpy(mat, centroids)
    )


def test_probed_cells_match_scanned_candidates(spark, emb, ivf_root):
    """The Spark reader's candidate set == the numpy recall twin's — the
    parity that lets BENCH/IVF_RECALL.json speak for the real operator."""
    meta = _meta(ivf_root)
    centroids = np.asarray(meta["centroids"], dtype=np.float64)
    pdf = emb.toPandas().sort_values("vec_id")
    mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    ids = pdf["vec_id"].to_numpy()
    assign = assign_cells_numpy(mat, centroids)
    qvec = mat[7]
    cells = ivf_probe_cells(qvec, centroids, n_probes=3)
    expected = set(ids[np.isin(assign, cells)].tolist())
    got = set(
        r["vec_id"]
        for r in spark.read.parquet(os.path.join(ivf_root, "vectors"))
        .where(F.col("cell").isin(cells))
        .select("vec_id")
        .collect()
    )
    assert got == expected


def test_build_is_deterministic(spark, emb, tmp_path):
    r1, r2 = str(tmp_path / "a"), str(tmp_path / "b")
    c1 = build_ivf_index(emb, r1, n_centroids=16, seed=7)
    c2 = build_ivf_index(emb.repartition(7), r2, n_centroids=16, seed=7)
    assert np.array_equal(c1, c2)  # sample is value-hashed + sorted, not scan-ordered
    a1 = spark.read.parquet(os.path.join(r1, "vectors")).select(
        "vec_id", "cell").toPandas().sort_values("vec_id")
    a2 = spark.read.parquet(os.path.join(r2, "vectors")).select(
        "vec_id", "cell").toPandas().sort_values("vec_id")
    assert list(a1["cell"]) == list(a2["cell"])


def test_neardup_recall_floor():
    """Planted near-dup queries (cos ≈ 0.9): recall@1 ≥ 0.9 at n_probes=4
    with 32 cells while scanning ≤ 25% of the corpus (measured 0.98 at
    ~13% on sf0.01 — floors leave variance slack)."""
    df = pq.read_table(os.path.join(SF_DIR, "embeddings.parquet")).to_pandas()
    corpus = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    ids = df["vec_id"].to_numpy()
    rng = np.random.default_rng(123)
    n_q = min(48, len(corpus))
    qidx = rng.choice(len(corpus), size=n_q, replace=False)
    q = corpus[qidx] + 0.06 * rng.standard_normal((n_q, corpus.shape[1]))
    curve = ivf_recall_curve(
        corpus, ids, q, k=1, n_centroids=32, n_probes_list=(4,)
    )
    recall, scanned = curve[4]
    assert recall >= 0.9, curve
    assert scanned <= 0.25, curve


def test_kmeans_handles_tiny_samples():
    """n_centroids > sample size degrades gracefully (cap, no crash) and
    centroids stay unit-norm."""
    x = np.random.default_rng(1).standard_normal((5, 8))
    c = kmeans_centroids(x, 16, seed=7)
    assert c.shape[0] <= 5
    assert np.allclose(np.linalg.norm(c, axis=1), 1.0)
