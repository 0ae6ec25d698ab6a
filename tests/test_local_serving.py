"""Driver-local serving path (query/local.py): rank-identical to the Spark
batch path on the same index files, across OR/AND/PHRASE, and fast (no
Spark job in the loop)."""

import time

import pytest

from invoicenet_spark.config import EngineConfig
from invoicenet_spark.fixtures import gen_pages_spark, gen_queries
from invoicenet_spark.index.build import build_index
from invoicenet_spark.query.exec import load_index, search
from invoicenet_spark.query.local import search_local

CFG = EngineConfig(shard_size=64, block_size=16, build_partitions=4, with_positions=True)


@pytest.fixture(scope="module")
def pos_index(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("localidx"))
    build_index(spark, gen_pages_spark(spark, 300, seed=42, partitions=4), out, CFG)
    return load_index(spark, out)


def test_local_matches_spark_path(spark, pos_index):
    queries = gen_queries(40, seed=42)
    spark_rows = search(spark, pos_index, queries, kernel="auto").collect()
    want = [
        (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 9), r["url"])
        for r in spark_rows
    ]
    got_df = search_local(pos_index, queries, kernel="auto")
    got = [
        (int(r.query_id), int(r.rank), int(r.doc_id), round(r.score, 9), r.url)
        for r in got_df.itertuples()
    ]
    assert sorted(got) == sorted(want)


def test_local_phrase_matches_spark_path(spark, pos_index):
    import pandas as pd

    # real bigrams from the corpus: reuse the hot-term path via gen_queries,
    # then force PHRASE mode on 2-term queries
    queries = gen_queries(30, seed=42)
    queries = queries[queries["terms"].map(len) == 2].copy()
    queries["mode"] = "PHRASE"
    assert len(queries) > 0
    spark_rows = search(spark, pos_index, queries, kernel="auto").collect()
    want = [(r["query_id"], r["rank"], r["doc_id"], round(r["score"], 9)) for r in spark_rows]
    got_df = search_local(pos_index, queries)
    got = [
        (int(r.query_id), int(r.rank), int(r.doc_id), round(r.score, 9))
        for r in got_df.itertuples()
    ]
    assert sorted(got) == sorted(want)


def test_local_phrase_requires_positions(spark, tmp_path):
    import pandas as pd

    out = str(tmp_path / "nopos")
    cfg = EngineConfig(shard_size=64, block_size=16, build_partitions=2)
    build_index(spark, gen_pages_spark(spark, 60, seed=42, partitions=2), out, cfg)
    idx = load_index(spark, out)
    q = pd.DataFrame([{"query_id": 1, "terms": ["a", "b"], "mode": "PHRASE", "k": 5}])
    with pytest.raises(ValueError, match="positional"):
        search_local(idx, q)


def test_local_is_fast(spark, pos_index):
    """No Spark job in the serving loop: after one warm call, a single query
    answers well under the ~1.2 s job-scheduling floor."""
    import pandas as pd

    q = gen_queries(1, seed=42)
    search_local(pos_index, q)  # warm (dictionary cache + arrow dataset)
    t0 = time.time()
    for _ in range(5):
        search_local(pos_index, q)
    per_query = (time.time() - t0) / 5
    assert per_query < 0.5, f"{per_query:.3f}s per query — serving path regressed"
