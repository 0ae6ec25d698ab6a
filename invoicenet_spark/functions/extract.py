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
import pyarrow as pa
import pyarrow.compute as pc
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

# Greedy body-paragraph capture, DOTALL so embedded newlines survive —
# must stay semantically identical to _ARROW_BODY_RE below (both greedy,
# both dotall) or the two extraction paths would diverge per url.
_BODY_RE = r"(?s)<body><p>(.*)</p></body>"
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


# Arrow-native variant: strings never boxed into Python objects — the regex
# runs in Arrow C++ (pc.extract_regex). Used on the build hot path via
# mapInArrow; byte-identical to the pandas path (same regex engine class:
# RE2 vs Python `re` — both anchor-free non-greedy captures; equivalence is
# pinned by tests comparing against the stored text column).
_ARROW_BODY_RE = r"<body><p>(?P<t>(?s:.*))</p></body>"


def extract_text_arrow(html: pa.Array) -> pa.Array:
    s = pc.cast(html, pa.large_string())
    st = pc.extract_regex(s, _ARROW_BODY_RE)
    out = pc.struct_field(st, "t")
    return pc.cast(pc.fill_null(out, ""), pa.string())


def extract_pages_arrow(df, html_col: str = "html", keep: tuple[str, ...] = ("url", "lang")):
    """pages → (keep..., text) wholly inside one mapInArrow stage."""
    cols = list(keep)

    def run(batches):
        for batch in batches:
            text = extract_text_arrow(batch.column(html_col))
            arrays = [batch.column(c) for c in cols] + [text]
            yield pa.RecordBatch.from_arrays(arrays, names=cols + ["text"])

    schema = ", ".join(
        [f"`{c}` {df.schema[c].dataType.simpleString()}" for c in cols] + ["`text` string"]
    )
    return df.mapInArrow(run, schema=schema)
