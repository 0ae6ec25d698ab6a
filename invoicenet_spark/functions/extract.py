"""Deterministic text extraction: html binary → text string.

Engine analog of the reference's OCR stage (invoicenet/common/util.py:93-168:
three pluggable engines, each a deterministic binary→words function; engine
selection is a strategy parameter, util.py:193). Here the strategy is a named
extractor:

- "body_p"     — greedy `<body><p>…</p></body>` capture; the fast path for
                 well-formed Common-Crawl-style fixture pages (runs in Arrow
                 C++ via pc.extract_regex, zero Python string boxing).
- "strip_tags" — general messy-HTML extractor (the DEFAULT): drop
                 <script>/<style> blocks and comments, strip all tags,
                 decode HTML entities (named + numeric), squeeze whitespace.
                 Runs in Arrow C++ (RE2 regex passes, strip_tags_arrow) on
                 the build hot path; the pandas pipeline is the semantic
                 spec and the byte-identity twin.
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

# strip_tags pipeline pieces (order matters: script/style blocks →
# comments → tags → entities → whitespace; decoding entities before
# tag-stripping would let &lt;script&gt; smuggle markup back in).
#
# Every pattern is expressible IDENTICALLY in Python `re` and in RE2
# (pyarrow's pc.replace_substring_regex): the script/style pass writes the
# two branches out in full instead of `<(script|style)…</\1>` (RE2 has no
# backreferences; the explicit alternation keeps the ORIGINAL single-pass
# leftmost-match semantics for interleaved script/style tags), and
# whitespace uses an explicit character class because RE2's `\s` is
# ASCII-only while Python's matches the full Unicode White_Space set (plus
# \x1c-\x1f). The class below IS Python's \s set, enumerated (a test pins
# the equivalence against r"\s").
_WS_CODEPOINTS = (
    list(range(0x09, 0x0E))          # \\t \\n \\v \\f \\r
    + list(range(0x1C, 0x21))        # FS GS RS US, space
    + [0x85, 0xA0, 0x1680]
    + list(range(0x2000, 0x200B))
    + [0x2028, 0x2029, 0x202F, 0x205F, 0x3000]
)
_WS_CLASS = "[" + "".join(map(chr, _WS_CODEPOINTS)) + "]"
_SCRIPT_STYLE_RE = (
    rf"(?is)<script\b[^>]*>.*?</script{_WS_CLASS}*>"
    rf"|<style\b[^>]*>.*?</style{_WS_CLASS}*>"
)
_COMMENT_RE = r"(?s)<!--.*?-->"
_TAG_RE = r"(?s)</?[a-zA-Z!][^>]*>"
_ENTITY_RE = r"&(?:#[0-9]{1,7}|#x[0-9a-fA-F]{1,6}|[a-zA-Z][a-zA-Z0-9]{1,30});"
_WS_RUN_RE = _WS_CLASS + "+"
_EDGE_SPACE_RE = r"^ | $"  # after the squeeze, edges hold at most one ' '


def _strip_tags_series(s: pd.Series) -> pd.Series:
    out = s.str.replace(_SCRIPT_STYLE_RE, " ", regex=True)
    out = out.str.replace(_COMMENT_RE, " ", regex=True)
    out = out.str.replace(_TAG_RE, " ", regex=True)
    # html.unescape per MATCH (not per row); unknown entities pass through
    out = out.str.replace(_ENTITY_RE, lambda m: _html.unescape(m.group(0)), regex=True)
    out = out.str.replace(_WS_RUN_RE, " ", regex=True)
    return out.str.replace(_EDGE_SPACE_RE, "", regex=True)


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


def _decode_utf8_arrow(html: pa.Array) -> pa.Array:
    """binary → large_string with the pandas path's exact decode semantics
    (U+FFFD replacement on invalid bytes), staying in C++ when the batch is
    clean UTF-8."""
    try:
        return pc.cast(html, pa.large_string())
    except pa.lib.ArrowInvalid:
        py = html.to_pandas().map(
            lambda b: b.decode("utf-8", errors="replace"), na_action="ignore"
        )
        return pa.Array.from_pandas(py, type=pa.large_string())


def extract_text_arrow(html: pa.Array) -> pa.Array:
    s = _decode_utf8_arrow(html)
    st = pc.extract_regex(s, _ARROW_BODY_RE)
    out = pc.struct_field(st, "t")
    return pc.cast(pc.fill_null(out, ""), pa.string())


def strip_tags_arrow(html: pa.Array) -> pa.Array:
    """Arrow-C++ strip_tags: the general messy-HTML extractor on the build
    hot path. All regex passes (script/style blocks, comments, tags,
    whitespace squeeze, edge trim) run in RE2 via pc.replace_substring_regex
    — the patterns are shared with the pandas spec and chosen to behave
    identically in `re` and RE2 (module header). The one non-RE2 piece is
    HTML-entity decoding (needs html.unescape's table): only the rows that
    STILL contain an entity after tag-stripping drop to the vectorized
    pandas replace — entities are sparse in real web text, so the common
    row never leaves C++. Byte-identity with _strip_tags_series is pinned
    by a nested-messy-HTML fuzz test (incl. invalid UTF-8)."""
    s = _decode_utf8_arrow(html)
    for pat in (_SCRIPT_STYLE_RE, _COMMENT_RE, _TAG_RE):
        s = pc.replace_substring_regex(s, pattern=pat, replacement=" ")
    mask = pc.match_substring_regex(s, _ENTITY_RE)
    if pc.any(mask).as_py():
        py = s.to_pandas()
        # null-fill arrow-side: pandas fillna on an object-dtype bool series
        # relies on deprecated silent downcasting (FutureWarning → error on
        # a pandas upgrade)
        sel = pc.fill_null(mask, False).to_numpy(zero_copy_only=False)
        py[sel] = py[sel].str.replace(
            _ENTITY_RE, lambda m: _html.unescape(m.group(0)), regex=True
        )
        s = pa.Array.from_pandas(py, type=pa.large_string())
    s = pc.replace_substring_regex(s, pattern=_WS_RUN_RE, replacement=" ")
    s = pc.replace_substring_regex(s, pattern=_EDGE_SPACE_RE, replacement="")
    return pc.cast(pc.fill_null(s, ""), pa.string())


_ARROW_TITLE_RE = r"(?is)<title[^>]*>(?P<t>.*?)</title>"


def extract_title_body_arrow(df, html_col: str = "html", keep: tuple[str, ...] = ("url",)):
    """pages → (keep..., title, body) for fielded indexes, wholly Arrow-side.

    title = first <title> element's inner text (entities/whitespace
    normalized by the same strip_tags passes, so `analyze(title)` equals
    what a browser tab shows tokenized); body = strip_tags of the WHOLE
    document — the title text therefore also appears in the body field,
    which is the standard web-search indexing choice (a title match scores
    in both fields)."""

    def run(batches):
        for batch in batches:
            s = _decode_utf8_arrow(batch.column(html_col))
            t = pc.struct_field(pc.extract_regex(s, _ARROW_TITLE_RE), "t")
            t = pc.fill_null(t, "")
            for pat in (_ENTITY_RE,):
                mask = pc.match_substring_regex(t, pat)
                if pc.any(mask).as_py():
                    py = t.to_pandas()
                    sel = mask.to_pandas().fillna(False).to_numpy(dtype=bool)
                    py[sel] = py[sel].str.replace(
                        pat, lambda m: _html.unescape(m.group(0)), regex=True
                    )
                    t = pa.Array.from_pandas(py, type=pa.large_string())
            t = pc.replace_substring_regex(t, pattern=_WS_RUN_RE, replacement=" ")
            t = pc.replace_substring_regex(t, pattern=_EDGE_SPACE_RE, replacement="")
            title = pc.cast(t, pa.string())
            body = strip_tags_arrow(batch.column(html_col))
            arrays = [batch.column(c) for c in keep] + [title, body]
            yield pa.RecordBatch.from_arrays(
                arrays, names=list(keep) + ["title", "body"]
            )

    schema = ", ".join(
        [f"`{c}` {df.schema[c].dataType.simpleString()}" for c in keep]
        + ["`title` string", "`body` string"]
    )
    return df.mapInArrow(run, schema=schema)


def extract_pages_arrow(
    df,
    html_col: str = "html",
    keep: tuple[str, ...] = ("url", "lang"),
    strategy: str = "body_p",
):
    """pages → (keep..., text) wholly inside one mapInArrow stage.

    body_p and strip_tags (the default) run their regexes in Arrow C++
    (RE2); other strategies run the vectorized pandas pipeline on the batch
    (same Arrow boundary, same output schema).
    """
    cols = list(keep)

    def run(batches):
        for batch in batches:
            if strategy == "body_p":
                text = extract_text_arrow(batch.column(html_col))
            elif strategy == "strip_tags":
                text = strip_tags_arrow(batch.column(html_col))
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
