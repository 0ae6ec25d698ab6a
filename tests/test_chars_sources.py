"""T4/T5 char codec, H1 word hash, F2 date extraction, S5 TSV source."""

import pandas as pd
from pyspark.sql import functions as F

from invoicenet_spark.functions.chars import (
    EOS,
    PAD,
    UNK,
    char_decode,
    char_encode,
    find_first_date,
    word_hash_16,
)


def test_char_roundtrip(spark):
    texts = ["hello", "Total: $42.50", "", "x" * 50]  # incl. truncation case
    df = spark.createDataFrame(pd.DataFrame({"s": texts}))
    out = df.select(
        "s", char_decode(char_encode("s", seq_len=32)).alias("back")
    ).collect()
    for r in out:
        assert r["back"] == r["s"][:31]


def test_char_encode_shape_and_specials(spark):
    df = spark.createDataFrame(pd.DataFrame({"s": ["ab", "é"]}))  # é is OOV
    rows = df.select(char_encode("s", seq_len=8).alias("ids")).collect()
    ab = list(rows[0]["ids"])
    assert len(ab) == 8
    assert ab[2] == EOS and ab[3:] == [PAD] * 5
    oov = list(rows[1]["ids"])
    assert oov[0] == UNK


def test_word_hash_16_bounds_and_determinism(spark):
    df = spark.createDataFrame(pd.DataFrame({"w": ["alpha", "beta", "alpha"]}))
    vals = [r[0] for r in df.select(word_hash_16("w")).collect()]
    assert vals[0] == vals[2]
    assert all(1 <= v <= (1 << 16) - 1 for v in vals)


def test_find_first_date(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "s": [
                    "invoice dated 2023-05-17 due soon",
                    "pay by 12/31/2020 latest",
                    "am 03.04.2021 bezahlt",
                    "no dates here",
                ]
            }
        )
    )
    got = [r[0] for r in df.select(find_first_date("s")).collect()]
    assert got == ["05-17-2023", "12-31-2020", "04-03-2021", None]


def test_tsv_pair_source(spark, tmp_path):
    """S5 (invoicenet/parsing/data.py:67-75): (source \\t target) lines."""
    p = tmp_path / "pairs.tsv"
    p.write_text("1,234.5\t1234.50\n99\t99.00\n0.5\t0.50\n")
    df = (
        spark.read.option("sep", "\t")
        .schema("source string, target string")
        .csv(str(p))
    )
    rows = {r["source"]: r["target"] for r in df.collect()}
    assert rows == {"1,234.5": "1234.50", "99": "99.00", "0.5": "0.50"}
    # and the engine normalizer reproduces the targets (golden-pair check)
    from invoicenet_spark.functions.normalize import normalize_amount

    out = df.select("target", normalize_amount("source").alias("norm")).collect()
    for r in out:
        assert r["norm"] == r["target"]
