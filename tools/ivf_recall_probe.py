"""Regenerate the IVF ANN recall contract table (BENCH/IVF_RECALL.json).

Measures recall + scanned fraction of the IVF coarse-quantizer index
(ops/similarity.py: spherical k-means cells, partition-pruned probes)
against exact cosine on the synthetic embeddings table, in the same two
regimes as the LSH probe (tools/ann_recall_probe.py) so the two scale
paths are directly comparable:

- neardup:  queries perturbed to cosine ≈0.9 of a corpus vector, recall@1
            (the near-duplicate-detection use case — the contract regime)
- top10:    queries at cosine ≈0.35-0.4 (the table's no-gap regime),
            recall@10 (information-theoretically hard for ANY sublinear
            method — reported to quantify exactly that)

The numpy twin is parity-pinned against the persisted Spark index by
tests/test_ivf.py. Usage: python tools/ivf_recall_probe.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from invoicenet_spark.ops.similarity import ivf_recall_curve  # noqa: E402

N_CENTROIDS = 64
SEED = 7


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    df = pq.read_table(os.path.join(sf_dir, "embeddings.parquet")).to_pandas()
    corpus = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    ids = df["vec_id"].to_numpy()
    rng = np.random.default_rng(123)
    n_q = min(64, len(corpus))
    qidx = rng.choice(len(corpus), size=n_q, replace=False)
    dim = corpus.shape[1]

    out = {"sf_dir": sf_dir, "n_corpus": int(len(corpus)), "n_queries": n_q,
           "params": {"n_centroids": N_CENTROIDS, "seed": SEED}}
    for regime, sigma, k in (("neardup", 0.06, 1), ("top10", 0.15, 10)):
        q = corpus[qidx] + sigma * rng.standard_normal((n_q, dim))
        qn = q / np.linalg.norm(q, axis=1, keepdims=True)
        cn = corpus / np.linalg.norm(corpus, axis=1, keepdims=True)
        cos = (qn * cn[qidx]).sum(1).mean()
        curve = ivf_recall_curve(
            corpus, ids, q, k=k, n_centroids=N_CENTROIDS, seed=SEED,
            n_probes_list=(1, 2, 4, 8, 16),
        )
        out[regime] = {
            "query_cos_to_source": round(float(cos), 3),
            "k": k,
            "curve": {
                str(p): {"recall": round(r, 4), "scanned_frac": round(s, 4)}
                for p, (r, s) in curve.items()
            },
        }
        print(f"{regime} (k={k}, query cos≈{cos:.2f}):")
        for p, (r, s) in curve.items():
            print(f"  n_probes={p}: recall={r:.3f} scanned={s:.3%}")

    os.makedirs(os.path.join(os.path.dirname(__file__), "..", "BENCH"), exist_ok=True)
    path = os.path.join(os.path.dirname(__file__), "..", "BENCH", "IVF_RECALL.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {os.path.normpath(path)}")


if __name__ == "__main__":
    main()
