"""Deterministic text extraction: html binary → text string.

Engine analog of the reference's OCR stage (invoicenet/common/util.py:93-168:
three pluggable engines, each a deterministic binary→words function; engine
selection is a strategy parameter, util.py:193). Here the strategy is a named
extractor:

- "body_p"     — greedy `<body><p>…</p></body>` capture; the fast path for
                 well-formed Common-Crawl-style fixture pages (runs in Arrow
                 C++ via pc.extract_regex, zero Python string boxing).
- "strip_tags" — general messy-HTML extractor: drop <script>/<style> blocks
                 and comments, strip all tags, decode HTML entities (named +
                 numeric), squeeze whitespace. Vectorized pandas string ops
                 over Arrow batches (regex in C; the entity callable runs per
                 MATCH, and entities are sparse).
- "title"      — `<title>…</title>` capture.

Invariant (BASELINE.json input_hint): extract(html) is **byte-identical per
url** — a pure function of the html bytes, no locale/time/environment
dependence. Malformed (non-UTF-8) bytes decode with U+FFFD replacement on
BOTH the pandas and Arrow paths, so the two paths never diverge per url.
The pytest byte-identity tests pin all of this.
"""

from __future__ import annotations

import html as _html

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

# strip_tags pipeline pieces (order matters: blocks → comments → tags →
# entities → whitespace; decoding entities before tag-stripping would let
# &lt;script&gt; smuggle markup back in).
_SCRIPT_STYLE_RE = r"(?is)<(script|style)\b[^>]*>.*?</\1\s*>"
_COMMENT_RE = r"(?s)<!--.*?-->"
_TAG_RE = r"(?s)</?[a-zA-Z!][^>]*>"
_ENTITY_RE = r"&(?:#[0-9]{1,7}|#x[0-9a-fA-F]{1,6}|[a-zA-Z][a-zA-Z0-9]{1,30});"


def _strip_tags_series(s: pd.Series) -> pd.Series:
    out = s.str.replace(_SCRIPT_STYLE_RE, " ", regex=True)
    out = out.str.replace(_COMMENT_RE, " ", regex=True)
    out = out.str.replace(_TAG_RE, " ", regex=True)
    # html.unescape per MATCH (not per row); unknown entities pass through
    out = out.str.replace(_ENTITY_RE, lambda m: _html.unescape(m.group(0)), regex=True)
    return out.str.replace(r"\s+", " ", regex=True).str.strip()


def _extract_series(html: pd.Series, strategy: str = "body_p") -> pd.Series:
    """Pure, vectorized html→text. bytes → utf-8 str (U+FFFD on invalid) →
    strategy-specific extraction."""
    # Arrow hands BinaryType as Python bytes objects inside the series.
    s = html.map(lambda b: b.decode("utf-8", errors="replace"), na_action="ignore")
    if strategy == "body_p":
        out = s.str.extract(_BODY_RE, expand=False)
    elif strategy == "title":
        out = s.str.extract(_TITLE_RE, expand=False)
    elif strategy == "strip_tags":
        out = _strip_tags_series(s)
    else:
        raise ValueError(f"unknown extraction strategy: {strategy}")
    return out.fillna("")


@F.pandas_udf(StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    return _extract_series(html, "body_p")


@F.pandas_udf(StringType())
def extract_title_udf(html: pd.Series) -> pd.Series:
    return _extract_series(html, "title")


@F.pandas_udf(StringType())
def extract_strip_tags_udf(html: pd.Series) -> pd.Series:
    return _extract_series(html, "strip_tags")


def extract_text(df, html_col: str = "html", out_col: str = "text_extracted",
                 strategy: str = "body_p"):
    """Append extracted text column. Narrow op — no shuffle."""
    udf = {"body_p": extract_text_udf, "title": extract_title_udf,
           "strip_tags": extract_strip_tags_udf}[strategy]
    return df.withColumn(out_col, udf(F.col(html_col)))


# Arrow-native variant: strings never boxed into Python objects — the regex
# runs in Arrow C++ (pc.extract_regex). Used on the build hot path via
# mapInArrow; byte-identical to the pandas path (same regex semantics; the
# equivalence is pinned by tests comparing against the stored text column).
_ARROW_BODY_RE = r"<body><p>(?P<t>(?s:.*))</p></body>"


def extract_text_arrow(html: pa.Array) -> pa.Array:
    try:
        s = pc.cast(html, pa.large_string())
    except pa.lib.ArrowInvalid:
        # invalid UTF-8 somewhere in the batch: decode permissively with the
        # exact semantics of the pandas path (U+FFFD replacement) so both
        # extraction paths stay byte-identical for ANY input bytes
        py = html.to_pandas().map(
            lambda b: b.decode("utf-8", errors="replace"), na_action="ignore"
        )
        s = pa.Array.from_pandas(py, type=pa.large_string())
    st = pc.extract_regex(s, _ARROW_BODY_RE)
    out = pc.struct_field(st, "t")
    return pc.cast(pc.fill_null(out, ""), pa.string())


def extract_pages_arrow(
    df,
    html_col: str = "html",
    keep: tuple[str, ...] = ("url", "lang"),
    strategy: str = "body_p",
):
    """pages → (keep..., text) wholly inside one mapInArrow stage.

    body_p runs the regex in Arrow C++; other strategies run the vectorized
    pandas pipeline on the batch (same Arrow boundary, same output schema).
    """
    cols = list(keep)

    def run(batches):
        for batch in batches:
            if strategy == "body_p":
                text = extract_text_arrow(batch.column(html_col))
            else:
                py = batch.column(html_col).to_pandas()
                text = pa.Array.from_pandas(
                    _extract_series(py, strategy), type=pa.string()
                )
            arrays = [batch.column(c) for c in cols] + [text]
            yield pa.RecordBatch.from_arrays(arrays, names=cols + ["text"])

    schema = ", ".join(
        [f"`{c}` {df.schema[c].dataType.simpleString()}" for c in cols] + ["`text` string"]
    )
    return df.mapInArrow(run, schema=schema)
