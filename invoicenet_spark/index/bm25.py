"""BM25 math, shared by the Spark kernels and the numpy oracle.

Formula fixed by BASELINE.json (k1=1.2, b=0.75):
    idf(t)      = ln((N - df + 0.5) / (df + 0.5) + 1)
    s(t, d)     = idf(t) * tf * (k1+1) / (tf + k1 * (1 - b + b * dl/avgdl))
    score(q, d) = Σ_{t ∈ q} s(t, d)
Accumulated in float64; rank ties broken by doc_id ascending (SURVEY.md §7
hard part (a)). The reference's analog is the masked global softmax + argmax
(invoicenet/acp/model.py:124-131, acp.py:117) — a sum of per-candidate
partial scores followed by top-1 selection; BM25 generalizes it to top-k.
"""

from __future__ import annotations

import numpy as np

K1 = 1.2
B = 0.75


def idf(N: int | float, df: np.ndarray | float) -> np.ndarray | float:
    return np.log((N - df + 0.5) / (df + 0.5) + 1.0)


def tf_score(
    tf: np.ndarray, dl: np.ndarray, avgdl: float, k1: float = K1, b: float = B
) -> np.ndarray:
    tf = np.asarray(tf, dtype=np.float64)
    dl = np.asarray(dl, dtype=np.float64)
    return tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))


def block_upper_bound(
    idf_t: float,
    max_tf: np.ndarray,
    min_dl: np.ndarray,
    avgdl: float,
    k1: float = K1,
    b: float = B,
) -> np.ndarray:
    """Per-block score upper bound from (max_tf, min_dl) — see codec.py."""
    return idf_t * tf_score(max_tf, min_dl, avgdl, k1, b)
