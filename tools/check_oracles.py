"""Local replica of the driver's correctness gate: run each queries() entry
on Spark and its oracle_sql() twin on DuckDB at sf0.01, compare row count,
schema (column names), and an order-insensitive value hash.

Usage: python tools/check_oracles.py [name ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)]
    rows = df.astype(str).apply(lambda r: "\x1f".join(r), axis=1).sort_values()
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


def check(spark, only: set[str] | None = None) -> tuple[list[str], int]:
    """Run every queries() entry (optionally restricted to `only`) against
    its DuckDB twin; returns (failures, n_checked). Importable so the pytest
    suite can hard-gate ALL oracles — including those past the driver's
    50-row cap (the round-4 rotation made regressions there invisible)."""
    import __spark_entry__ as entry

    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    queries = entry.queries()
    oracles = entry.oracle_sql()
    failures = []
    n_checked = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        n_checked += 1
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error: {type(e).__name__}: {str(e)[:300]}")
            continue
        if name not in oracles:
            print(f"ok?  {name}: rows={len(sdf)} (rows-only, no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            ddf = con.sql(oracles[name]).df()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {str(e)[:300]}")
            continue
        problems = []
        if len(sdf) != len(ddf):
            problems.append(f"rows {len(sdf)} vs {len(ddf)}")
        if sorted(sdf.columns) != sorted(ddf.columns):
            problems.append(f"cols {sorted(sdf.columns)} vs {sorted(ddf.columns)}")
        elif value_hash(sdf) != value_hash(ddf):
            problems.append("value hash mismatch")
            # show a diff sample
            s = sdf[sorted(sdf.columns)].astype(str)
            d = ddf[sorted(ddf.columns)].astype(str)
            sk = set(map(tuple, s.values.tolist()))
            dk = set(map(tuple, d.values.tolist()))
            only_s = list(sk - dk)[:3]
            only_d = list(dk - sk)[:3]
            problems.append(f"spark-only={only_s} duck-only={only_d}")
        if problems:
            failures.append(name)
            print(f"FAIL {name}: {'; '.join(problems)}")
        else:
            print(f"PASS {name}: rows={len(sdf)} [{time.time()-t0:.1f}s]")
    return failures, n_checked


def main():
    from invoicenet_spark.session import get_spark

    spark = get_spark("oracle_check", shuffle_partitions=8, driver_memory="16g")
    failures, _ = check(spark, set(sys.argv[1:]) or None)
    print(f"\n{len(failures)} failures: {failures}" if failures else "\nALL PASS")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
