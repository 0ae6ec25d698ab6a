"""date_histogram aggregation (exec.date_histogram / local twin): calendar
bucketing of matched docs' warc_ts — Spark/serving value-identity across
every interval, Spark date_trunc boundary semantics (Monday weeks, period
starts), NULL-timestamp exclusion, min_doc_count filtering."""

import datetime

import pandas as pd
import pytest

from invoicenet_spark.config import EngineConfig
from invoicenet_spark.query.exec import date_histogram, load_index, search
from invoicenet_spark.query.local import date_histogram_local, search_local

CFG = EngineConfig(shard_size=32, block_size=8, build_partitions=4)

# timestamps straddling hour/day/week/month/year boundaries; doc 5 has NULL
TS = [
    "2023-12-31 23:30:00",   # year boundary (2023)
    "2024-01-01 00:10:00",
    "2024-01-01 23:59:59",
    "2024-01-07 12:00:00",   # Sunday → belongs to the Jan-1 Monday week
    "2024-01-08 00:00:00",   # Monday → next week bucket
    None,                    # excluded from every histogram
    "2024-02-15 08:45:00",
    "2024-02-15 09:05:00",   # same day, next hour
]


@pytest.fixture(scope="module")
def ts_idx(spark, tmp_path_factory):
    from invoicenet_spark.index.build import build_index

    rows = [
        (
            f"{i:03d}",
            datetime.datetime.fromisoformat(t) if t else None,
            f"common tok{i}",
            "en",
        )
        for i, t in enumerate(TS)
    ]
    pages = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, text string, lang string"
    )
    root = str(tmp_path_factory.mktemp("ts_idx") / "index")
    build_index(spark, pages, root, CFG, use_stored_text=True)
    return root


@pytest.mark.parametrize("interval", ["hour", "day", "week", "month", "year"])
def test_spark_serving_parity(spark, ts_idx, interval):
    index = load_index(spark, ts_idx)
    q = pd.DataFrame([{"query_id": 1, "terms": ["common"], "mode": "OR", "k": 1}])
    matches = search(spark, index, q, matches_only=True)
    sp = (
        date_histogram(matches, index.docs, interval)
        .toPandas()
        .sort_values(["query_id", "bucket"])
        .reset_index(drop=True)
    )
    lm = search_local(ts_idx, pd.DataFrame(
        [{"query_id": 1, "terms": ["common"], "mode": "OR", "k": 100}]
    ))
    lo = date_histogram_local(lm, ts_idx, interval)
    assert list(lo["n_docs"]) == list(sp["n_docs"])
    assert [pd.Timestamp(b) for b in lo["bucket"]] == [
        pd.Timestamp(b) for b in sp["bucket"]
    ]
    # the NULL-ts doc matched but is in no bucket
    assert int(sp["n_docs"].sum()) == len([t for t in TS if t])


def test_boundaries(spark, ts_idx):
    index = load_index(spark, ts_idx)
    q = pd.DataFrame([{"query_id": 1, "terms": ["common"], "mode": "OR", "k": 1}])
    matches = search(spark, index, q, matches_only=True)

    def buckets(interval):
        return {
            str(r["bucket"]): int(r["n_docs"])
            for r in date_histogram(matches, index.docs, interval).collect()
        }

    assert buckets("year") == {"2023-01-01 00:00:00": 1, "2024-01-01 00:00:00": 6}
    wk = buckets("week")
    # Jan 1 2024 is a Monday: docs 1,2,3 (Jan 1 + Sunday Jan 7) in that week
    assert wk["2024-01-01 00:00:00"] == 3
    assert wk["2024-01-08 00:00:00"] == 1
    # 2023-12-31 is a Sunday → its week floors to Monday Dec 25
    assert wk["2023-12-25 00:00:00"] == 1
    day = buckets("day")
    assert day["2024-01-01 00:00:00"] == 2
    hr = buckets("hour")
    assert hr["2024-02-15 08:00:00"] == 1 and hr["2024-02-15 09:00:00"] == 1


def test_min_doc_count_and_guards(spark, ts_idx):
    index = load_index(spark, ts_idx)
    q = pd.DataFrame([{"query_id": 1, "terms": ["common"], "mode": "OR", "k": 1}])
    matches = search(spark, index, q, matches_only=True)
    day2 = date_histogram(matches, index.docs, "day", min_doc_count=2).toPandas()
    assert (day2["n_docs"] >= 2).all() and len(day2) >= 1
    lm = search_local(ts_idx, pd.DataFrame(
        [{"query_id": 1, "terms": ["common"], "mode": "OR", "k": 100}]
    ))
    lo2 = date_histogram_local(lm, ts_idx, "day", min_doc_count=2)
    assert list(lo2["n_docs"]) == list(day2.sort_values("bucket")["n_docs"])
    with pytest.raises(ValueError, match="interval"):
        date_histogram(matches, index.docs, "fortnight")
    with pytest.raises(ValueError, match="gap filling"):
        date_histogram_local(lm, ts_idx, "day", min_doc_count=0)
