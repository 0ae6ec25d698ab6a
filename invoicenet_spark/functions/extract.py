"""Deterministic text extraction: html binary → text string.

Engine analog of the reference's OCR stage (invoicenet/common/util.py:93-168:
three pluggable engines, each a deterministic binary→words function; engine
selection is a strategy parameter, util.py:193). Here the strategy is a named
extractor; the default handles the well-formed `<body><p>…</p></body>` shape
of Common-Crawl-style fixture pages.

Invariant (BASELINE.json input_hint): extract(html) is **byte-identical per
url** — a pure function of the html bytes, no locale/time/environment
dependence. The pytest byte-identity test pins this.

Vectorized: pandas string ops over Arrow batches; no per-row Python.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

# Non-greedy body-paragraph capture, DOTALL so embedded newlines survive.
_BODY_RE = r"<body><p>(.*)</p></body>"
_TITLE_RE = r"<title>(.*?)</title>"


def _extract_series(html: pd.Series, strategy: str = "body_p") -> pd.Series:
    """Pure, vectorized html→text. bytes → utf-8 str → regex capture."""
    # Arrow hands BinaryType as Python bytes objects inside the series.
    s = html.map(lambda b: b.decode("utf-8", errors="replace"), na_action="ignore")
    if strategy == "body_p":
        out = s.str.extract(_BODY_RE, expand=False)
    elif strategy == "title":
        out = s.str.extract(_TITLE_RE, expand=False)
    else:
        raise ValueError(f"unknown extraction strategy: {strategy}")
    return out.fillna("")


@F.pandas_udf(StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    return _extract_series(html, "body_p")


@F.pandas_udf(StringType())
def extract_title_udf(html: pd.Series) -> pd.Series:
    return _extract_series(html, "title")


def extract_text(df, html_col: str = "html", out_col: str = "text_extracted"):
    """Append extracted text column. Narrow op — no shuffle."""
    return df.withColumn(out_col, extract_text_udf(F.col(html_col)))
