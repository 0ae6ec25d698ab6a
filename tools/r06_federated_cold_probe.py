"""Round-6 probe: federated cold-query cost vs segment count.

Builds 16 tiny segment indexes, then measures the first-query wall time of
a fresh FederatedIndex two ways in ONE session, interleaved:
  batched   — the round-6 path (global_segments prefetches every live
              segment's (term → term_id, union df) dictionary in ONE
              union job)
  lazy      — the round-5 behavior, simulated by clearing the prefetched
              _local_dict on every handle so each segment's Index warms
              its dictionary with its own count + toPandas driver jobs

Writes BENCH/r06/FEDERATED_COLD.json."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd

from invoicenet_spark.config import EngineConfig
from invoicenet_spark.fixtures import gen_pages_spark, make_vocab
from invoicenet_spark.index.build import build_index
from invoicenet_spark.query.federate import FederatedIndex, search_federated
from invoicenet_spark.session import get_spark

N_SEG = 16
DOCS_PER_SEG = 400


def main():
    import tempfile

    spark = get_spark("fed_cold", cores=8, shuffle_partitions=8)
    base = tempfile.mkdtemp(prefix="fedcold_")
    roots = []
    for i in range(N_SEG):
        pages = gen_pages_spark(
            spark, DOCS_PER_SEG, seed=42, partitions=4, start=i * DOCS_PER_SEG
        )
        root = os.path.join(base, f"seg{i:02d}")
        build_index(
            spark, pages, root,
            EngineConfig(shard_size=256, block_size=32, build_partitions=4),
        )
        roots.append(root)

    vocab = make_vocab(42)
    q = pd.DataFrame(
        [{"query_id": 1, "terms": [vocab[1], vocab[40]], "mode": "OR", "k": 10}]
    )

    def cold_query(mode: str) -> float:
        fed = FederatedIndex(spark, roots)
        t0 = time.perf_counter()
        handles = fed.global_segments(tuple(range(N_SEG)))
        if mode == "lazy":
            for h in handles:
                h._local_dict = None  # simulate round-5: per-segment warmup
        search_federated(spark, fed, q.copy()).collect()
        return round(time.perf_counter() - t0, 3)

    cold_query("batched")  # warm JIT / page cache once
    rows = {"batched": [], "lazy": []}
    for _ in range(3):
        rows["batched"].append(cold_query("batched"))
        rows["lazy"].append(cold_query("lazy"))
    out = {
        "n_segments": N_SEG,
        "cold_first_query_sec_batched": sorted(rows["batched"])[1],
        "cold_first_query_sec_lazy": sorted(rows["lazy"])[1],
        "samples": rows,
        "note": "batched = ONE union dictionary-resolution job at open; "
                "lazy = two driver jobs per segment on the first query "
                "(round-5 behavior, simulated by clearing the prefetch)",
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH", "r06", "FEDERATED_COLD.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
