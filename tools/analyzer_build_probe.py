"""Price the analyzer chain on the build hot path → BENCH/ANALYZER.json.

The chain (stop-word filter + S-stemmer, functions/analyzer.py analyze_col)
is pure JVM expressions inside the same whole-stage-codegen region as the
tokenizer, so the expected cost is a few extra string ops per token — this
probe measures it: same corpus, same layout, chain off vs on (best warm of
`--reps`), plus the resulting index size shift (stopword postings gone).
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

# the classic English function-word head — what a real deployment strips
STOPWORDS = (
    "the", "of", "and", "a", "to", "in", "is", "it", "for", "on",
    "that", "this", "with", "as", "at", "by", "an", "be", "or", "are",
)


def _tree_bytes(root: str) -> int:
    total = 0
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            total += os.path.getsize(os.path.join(dirpath, f))
    return total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=100_000)
    ap.add_argument("--cores", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", 32)))
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    from invoicenet_spark.config import EngineConfig
    from invoicenet_spark.fixtures import gen_pages_spark
    from invoicenet_spark.index.build import build_index
    from invoicenet_spark.session import get_spark

    spark = get_spark("analyzer-probe", cores=args.cores,
                      shuffle_partitions=args.cores, driver_memory="48g")
    pages_path = os.path.join(tempfile.gettempdir(), "an_probe_pages")
    gen_pages_spark(spark, args.docs, seed=42, partitions=args.cores).write.mode(
        "overwrite"
    ).parquet(pages_path)
    pages = spark.read.parquet(pages_path)

    # pre-warm the python worker pool (bench.py's steady-state trick)
    def _noop(batches):
        for b in batches:
            yield b

    spark.range(0, args.cores * 4, 1, args.cores).mapInArrow(
        _noop, schema="id long"
    ).count()

    out = {"n_docs": args.docs, "cores": args.cores, "reps": args.reps}
    for name, cfg in (
        ("plain", EngineConfig(shard_size=1 << 14, block_size=128,
                               build_partitions=args.cores)),
        ("chain", EngineConfig(shard_size=1 << 14, block_size=128,
                               build_partitions=args.cores,
                               stopwords=STOPWORDS, stem="s_stem")),
    ):
        times = []
        last_root = None
        for _ in range(args.reps):
            root = tempfile.mkdtemp(prefix=f"an_probe_{name}_")
            t0 = time.perf_counter()
            build_index(spark, pages, os.path.join(root, "index"), cfg)
            times.append(round(time.perf_counter() - t0, 3))
            if last_root:
                shutil.rmtree(last_root, ignore_errors=True)
            last_root = root
        out[name] = {
            "build_sec_best": min(times),
            "build_sec_reps": times,
            "index_bytes": _tree_bytes(last_root),
        }
        shutil.rmtree(last_root, ignore_errors=True)
    out["chain_overhead"] = round(
        out["chain"]["build_sec_best"] / out["plain"]["build_sec_best"], 3
    )
    out["index_size_ratio"] = round(
        out["chain"]["index_bytes"] / out["plain"]["index_bytes"], 3
    )
    dest = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "BENCH", "ANALYZER.json")
    with open(dest, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
