"""Snippets / highlighting over stored text (query/snippets.py).

Pins: make_snippet's window selection and faithful-slice property; the
store_text docs-table column through build AND incremental update; parity
between the Spark batch wrapper and the serving wrapper; the clear error
on an index without stored text.
"""

import pandas as pd
import pytest

from invoicenet_spark.config import EngineConfig
from invoicenet_spark.index.build import build_index
from invoicenet_spark.query.exec import load_index, search
from invoicenet_spark.query.local import search_local
from invoicenet_spark.query.snippets import (
    attach_snippets,
    attach_snippets_local,
    make_snippet,
)

CFG = EngineConfig(
    shard_size=64, block_size=16, build_partitions=4, store_text=True,
    with_positions=True,
)


def test_make_snippet_pure():
    text = "Alpha beta GAMMA delta epsilon zeta eta theta"
    s = make_snippet(text, ["gamma", "zeta"], width=8)
    # full text fits the window: faithful slice, both terms highlighted
    assert s == "Alpha beta «GAMMA» delta epsilon «zeta» eta theta"

    # narrow window: picks the window with the most distinct terms
    long = " ".join(f"w{i}" for i in range(50)) + " gamma " + " ".join(
        f"x{i}" for i in range(50)
    )
    s2 = make_snippet(long, ["gamma"], width=5)
    assert "«gamma»" in s2 and s2.startswith("… ") and s2.endswith(" …")
    assert len(s2) < len(long)

    # no hits: leading-window fallback, no markers
    s3 = make_snippet(text, ["nope"], width=4)
    assert s3 == "Alpha beta GAMMA delta …"
    # punctuation between tokens is preserved verbatim
    s4 = make_snippet("a, b; c", ["b"], width=5)
    assert s4 == "a, «b»; c"
    assert make_snippet("", ["x"]) == ""


def test_snippets_end_to_end(spark, tmp_path):
    rows = [
        ("u1", "The spark engine shuffles data across the cluster quickly"),
        ("u2", "A window function and a spark join walk into a bar"),
        ("u3", "Nothing relevant lives in this document at all"),
    ]
    pages = spark.createDataFrame(
        [(u, None, None, t, "en") for u, t in rows],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    root = str(tmp_path / "snip_idx")
    build_index(spark, pages, root, CFG, use_stored_text=True)
    idx = load_index(spark, root)
    assert "text" in idx.docs.columns  # store_text persisted the column

    q = pd.DataFrame(
        [{"query_id": 1, "terms": ["spark", "join"], "mode": "OR", "k": 10}]
    )
    res = search(spark, idx, q)
    got = attach_snippets(spark, idx, res, q).toPandas().sort_values("rank")
    assert len(got) == 2
    by_url = dict(zip(got["url"], got["snippet"]))
    assert "«spark» «join»" in by_url["u2"].replace("a «spark» «join»", "«spark» «join»") or (
        "«spark»" in by_url["u2"] and "«join»" in by_url["u2"]
    )
    assert "«spark»" in by_url["u1"] and "«join»" not in by_url["u1"]
    # snippet is a faithful slice: stripping markers recovers original text
    raw = by_url["u1"].replace("«", "").replace("»", "")
    assert raw in rows[0][1]

    # serving path produces identical snippets
    loc = search_local(root, q)
    loc_s = attach_snippets_local(root, loc, q)
    a = got.sort_values("doc_id")["snippet"].tolist()
    b = loc_s.sort_values("doc_id")["snippet"].tolist()
    assert a == b

    # empty result frame round-trips
    q0 = pd.DataFrame(
        [{"query_id": 1, "terms": ["zzzmissing"], "mode": "AND", "k": 10}]
    )
    empty = attach_snippets_local(root, search_local(root, q0), q0)
    assert list(empty.columns)[-1] == "snippet" and len(empty) == 0


def test_snippets_over_bool_queries(spark, tmp_path):
    """BOOL rows highlight their tree's POSITIVE leaf terms: negated terms
    never mark (they cannot appear in a matching doc), grammar strings and
    tree dicts both resolve, on both paths."""
    rows = [
        ("u1", "The spark engine shuffles data across the cluster quickly"),
        ("u2", "A window function and a spark join walk into a bar"),
        ("u3", "A lonely window watches the rain"),
    ]
    pages = spark.createDataFrame(
        [(u, None, None, t, "en") for u, t in rows],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    root = str(tmp_path / "snip_bool_idx")
    build_index(spark, pages, root, CFG, use_stored_text=True)
    idx = load_index(spark, root)

    q = pd.DataFrame(
        [{"query_id": 1, "terms": ["(spark OR window) NOT join"], "mode": "BOOL", "k": 10}]
    )
    res = search(spark, idx, q)
    got = attach_snippets(spark, idx, res, q).toPandas()
    by_url = dict(zip(got["url"], got["snippet"]))
    assert set(by_url) == {"u1", "u3"}  # u2 excluded by NOT join
    assert "«spark»" in by_url["u1"]
    assert "«window»" in by_url["u3"]
    loc = attach_snippets_local(root, search_local(root, q), q)
    assert sorted(loc["snippet"]) == sorted(got["snippet"])


def test_snippets_survive_incremental_update(spark, tmp_path):
    from invoicenet_spark.sources.snapshots import SnapshotTable
    from invoicenet_spark.streaming.incremental import update_index

    table = SnapshotTable(str(tmp_path / "table"))
    root = str(tmp_path / "idx")
    base = [("u1", "spark shuffles data")]
    delta = [("u2", "another spark document arrives later")]
    for batch in (base, delta):
        table.append(
            spark.createDataFrame(
                [(u, None, None, t, "en") for u, t in batch],
                "url string, warc_ts timestamp, html binary, text string, lang string",
            )
        )
        update_index(spark, table, root, CFG, use_stored_text=True)

    q = pd.DataFrame([{"query_id": 1, "terms": ["spark"], "mode": "OR", "k": 10}])
    got = attach_snippets_local(root, search_local(root, q), q)
    assert len(got) == 2 and all("«spark»" in s for s in got["snippet"])


def test_snippets_use_index_token_pattern(spark, tmp_path):
    """A custom analyzer pattern (underscores kept in tokens) flows through
    stats.json into snippet tokenization — 'foo_bar' highlights as ONE
    token, exactly as it was indexed."""
    from dataclasses import replace as dc_replace

    cfg = dc_replace(CFG, token_pattern="[^a-z0-9_]+")
    pages = spark.createDataFrame(
        [("u1", None, None, "alpha foo_bar omega trailer", "en")],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    root = str(tmp_path / "pat_idx")
    build_index(spark, pages, root, cfg, use_stored_text=True)
    q = pd.DataFrame(
        [{"query_id": 1, "terms": ["foo_bar"], "mode": "OR", "k": 5}]
    )
    res = search_local(root, q)
    assert len(res) == 1  # the custom pattern indexed foo_bar as one term
    got = attach_snippets_local(root, res, q)
    assert got["snippet"].iloc[0] == "alpha «foo_bar» omega trailer"


def test_snippets_require_store_text(spark, tmp_path):
    from dataclasses import replace as dc_replace

    pages = spark.createDataFrame(
        [("u1", None, None, "plain text here", "en")],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    root = str(tmp_path / "nostore_idx")
    build_index(
        spark, pages, root, dc_replace(CFG, store_text=False), use_stored_text=True
    )
    idx = load_index(spark, root)
    q = pd.DataFrame([{"query_id": 1, "terms": ["plain"], "mode": "OR", "k": 10}])
    with pytest.raises(ValueError, match="store_text"):
        attach_snippets(spark, idx, search(spark, idx, q), q)
    with pytest.raises(ValueError, match="store_text"):
        attach_snippets_local(root, search_local(root, q), q)
