"""Round-6 probe: cursored-page latency on the skewed fixture (stopword +
rare-term OR). Pre-round, any `after` cursor dropped pure-OR queries to the
exhaustive kernel, so page 2+ decoded the stopword list page 1 skipped.
Times page 1 vs page 2 on the pruned and exhaustive kernels and checks
bit-identity. Writes BENCH/r06/CURSOR_PRUNE.json."""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from invoicenet_spark.index.codec import encode_posting_list
from invoicenet_spark.query import kernels

K1, B = 1.2, 0.75
BLOCK = 128


def make_list(rng, n_docs, df, tid, dls, avgdl):
    docs = np.sort(rng.choice(n_docs, size=df, replace=False)).astype(np.int64)
    tfs = rng.integers(1, 8, size=df).astype(np.int64)
    row = encode_posting_list(docs, tfs, dls[docs], block_size=BLOCK)
    row["term_id"] = tid
    idf = float(np.log((n_docs - df + 0.5) / (df + 0.5) + 1.0))
    return kernels.TermPostings(row, idf=idf, avgdl=avgdl, k1=K1, b=B)


def med(fn, reps=9):
    fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def main():
    rng = np.random.default_rng(7)
    n_docs = 1_200_000
    dls = rng.integers(30, 400, size=n_docs).astype(np.int64)
    avgdl = float(dls.mean())
    stop = make_list(rng, n_docs, 1_000_000, 0, dls, avgdl)
    rare = make_list(rng, n_docs, 200, 1, dls, avgdl)
    plists = [stop, rare]
    k = 10

    d1, s1 = kernels.score_blockmax(plists, k)
    cursor = (float(s1[-1]), int(d1[-1]))

    # bit-identity of the cursored pruned page vs exhaustive
    e2 = kernels.score_exhaustive(plists, k, "OR", after=cursor)
    g2 = kernels.score_blockmax(plists, k, after=cursor)
    assert np.array_equal(e2[0], g2[0]) and np.array_equal(e2[1], g2[1])

    out = {
        "fixture": "skewed OR: df=1M stopword + df=200 rare, 1.2M docs, k=10",
        "page1_pruned_ms": round(med(lambda: kernels.score_blockmax(plists, k)) * 1e3, 2),
        "page2_pruned_ms": round(
            med(lambda: kernels.score_blockmax(plists, k, after=cursor)) * 1e3, 2
        ),
        "page2_exhaustive_ms": round(
            med(lambda: kernels.score_exhaustive(plists, k, "OR", after=cursor)) * 1e3,
            2,
        ),
        "bit_identical": True,
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH", "r06", "CURSOR_PRUNE.json",
    )
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
