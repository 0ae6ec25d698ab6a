"""Byte-identity extraction (input_hint invariant) + analyzer conformance."""

import pandas as pd
from pyspark.sql import functions as F

from invoicenet_spark.functions.analyzer import ngrams_col, tokens_col
from invoicenet_spark.functions.extract import _extract_series, extract_text
from invoicenet_spark.oracle.bm25_numpy import tokenize as oracle_tokenize


def test_extract_byte_identity_pandas(tiny_pages_pd):
    out = _extract_series(tiny_pages_pd["html"])
    assert (out == tiny_pages_pd["text"]).all()


def test_extract_byte_identity_spark(tiny_pages):
    df = extract_text(tiny_pages, "html", "text_extracted")
    bad = df.where(F.col("text_extracted") != F.col("text")).count()
    assert bad == 0
    # byte-level check, not just string equality
    bad_b = df.where(
        F.encode(F.col("text_extracted"), "utf-8") != F.encode(F.col("text"), "utf-8")
    ).count()
    assert bad_b == 0


def test_extract_pure_function_of_bytes():
    s = pd.Series([b"<html><head><title>t</title></head><body><p>a b  c!</p></body></html>"])
    assert _extract_series(s).iloc[0] == "a b  c!"
    assert (_extract_series(s) == _extract_series(s)).all()


def test_tokenizer_matches_oracle(spark, tiny_pages):
    rows = (
        tiny_pages.limit(50)
        .select("url", "text", tokens_col("text").alias("toks"))
        .collect()
    )
    for r in rows:
        assert list(r["toks"]) == oracle_tokenize(r["text"]), r["url"]


def test_tokenizer_edge_cases(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"text": ["", "  ", "A-b_c 42!", "ÜBER café", "a  b"]})
    )
    got = [list(r[0]) for r in df.select(tokens_col("text")).collect()]
    assert got == [[], [], ["a", "b", "c", "42"], ["ber", "caf"], ["a", "b"]]


def test_ngrams(spark):
    df = spark.createDataFrame(pd.DataFrame({"text": ["the quick fox"]}))
    grams = df.select(ngrams_col("text", n_max=2).alias("g")).collect()[0]["g"]
    assert list(grams) == ["the", "quick", "fox", "the quick", "quick fox"]
