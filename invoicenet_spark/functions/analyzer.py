"""Tokenizer / analyzer — all JVM-side built-in expressions.

Semantics pinned by the reference (SURVEY.md §2.3, §2.5):
  - lowercase match semantics (invoicenet/gui/viewer.py:211)
  - drop empty tokens (invoicenet/common/util.py:105)
  - split on non-alphanumeric runs

Staying in `pyspark.sql.functions` keeps tokenization inside whole-stage
codegen — the hot path of index construction never crosses into Python.
The DuckDB-oracle equivalent (same semantics) is:

    unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                       t -> t <> ''))
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_PATTERN = "[^a-z0-9]+"


def tokens_col(text_col: str | Column = "text", pattern: str = TOKEN_PATTERN) -> Column:
    """array<string> of non-empty lowercase tokens, in reading order (K3)."""
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.filter(F.split(F.lower(col), pattern), lambda t: t != F.lit(""))


def tokenize_pages(df, text_col: str = "text", with_positions: bool = True):
    """pages-like df → one row per token: (…, pos int, term string).

    posexplode preserves reading order (reference analog: OCR emits words in
    reading order, invoicenet/common/util.py:171-190). `doc_len` is computed
    doc-side before the explode so no window/self-join is needed later.
    """
    toks = df.withColumn("_tokens", tokens_col(text_col)).withColumn(
        "doc_len", F.size("_tokens")
    )
    if with_positions:
        exploded = toks.select(
            "*", F.posexplode("_tokens").alias("pos", "term")
        ).drop("_tokens")
    else:
        exploded = toks.select("*", F.explode("_tokens").alias("term")).drop("_tokens")
    return exploded


def ngrams_col(text_col: str | Column = "text", n_max: int = 4) -> Column:
    """All 1..n_max-grams per document (reference T2: all 1..4-grams within a
    line, invoicenet/common/util.py:196). Built from the token array with
    JVM-side transform/slice — no UDF.

    Returns array<string> of space-joined n-grams (T3 join semantics,
    invoicenet/common/util.py:201).
    """
    toks = tokens_col(text_col)

    def grams_of(n: int):
        # NB: the lambda must stay 1-ary — a 2-ary lambda makes Spark bind
        # the second parameter to the array index. Guard: sequence(1, 0)
        # DESCENDS in Spark, so short docs need an explicit empty array.
        return F.when(
            F.size(toks) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1)),
                lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
            ),
        ).otherwise(F.array().cast("array<string>"))

    grams = [grams_of(n) for n in range(1, n_max + 1)]
    out = grams[0]
    for g in grams[1:]:
        out = F.concat(out, g)
    return out
