"""Text-analysis ops for a large-scale training-data pipeline: language ID,
quality scoring, token counting, document fingerprinting.

All pure column expressions (JVM codegen) so they run at full scan speed on
100 TB inputs; nothing here shuffles. Each has a DuckDB-SQL twin in
__spark_entry__ oracles.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from invoicenet_spark.functions.analyzer import tokens_col

# Fixed tiny stopword lists per language — the n-gram/stopword-ratio
# heuristic (deterministic, no model). Order matters for tie-break.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "for", "on"],
    "de": ["der", "die", "das", "und", "ist", "ein", "nicht", "mit", "zu", "den"],
    "fr": ["le", "la", "les", "et", "des", "un", "une", "est", "dans", "pour"],
    "es": ["el", "la", "los", "de", "que", "y", "en", "un", "es", "por"],
}


def token_count_ws(col: str | Column = "text") -> Column:
    """Whitespace token count (the 'fast path' counter)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.filter(F.split(c, r"\s+"), lambda t: t != F.lit("")))


def token_count_bpe_ish(col: str | Column = "text") -> Column:
    """BPE-ish regex token count: words, numbers, and punctuation runs each
    count as one token (approximation of byte-pair pretokenization)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(
        F.regexp_extract_all(c, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"), 0)
    )


def stopword_ratio(lang: str, col: str | Column = "text") -> Column:
    toks = tokens_col(col)
    sw = STOPWORDS[lang]
    hits = F.size(F.filter(toks, lambda t: t.isin(sw)))
    return (hits / F.greatest(F.size(toks), F.lit(1))).cast("double")


def lang_id_expr(col: str | Column = "text") -> Column:
    """Pick the language with the highest stopword ratio; 'unk' if all zero.
    Deterministic tie-break by language order en,de,fr,es."""
    ratios = [(lang, stopword_ratio(lang, col)) for lang in STOPWORDS]
    best_lang = F.lit("unk")
    best_r = F.lit(0.0)
    # fold right-to-left so earlier langs win ties via strict '>'
    for lang, r in reversed(ratios):
        cond = r > best_r
        best_lang = F.when(cond, F.lit(lang)).otherwise(best_lang)
        best_r = F.when(cond, r).otherwise(best_r)
    return best_lang


def quality_score(col: str | Column = "text") -> Column:
    """Composite [0,1] quality heuristic: length band + alpha ratio +
    mean word length band. Matches the SQL twin exactly (all integer/char
    arithmetic, round at the end)."""
    c = F.col(col) if isinstance(col, str) else col
    n_chars = F.length(c)
    toks = tokens_col(c)
    n_toks = F.greatest(F.size(toks), F.lit(1))
    alpha = F.length(F.regexp_replace(c, "[^A-Za-z]", ""))
    alpha_ratio = alpha / F.greatest(n_chars, F.lit(1))
    mean_wlen = alpha / n_toks
    len_ok = (n_chars >= 100) & (n_chars <= 20000)
    wlen_ok = (mean_wlen >= 3.0) & (mean_wlen <= 10.0)
    score = (
        F.when(len_ok, F.lit(0.4)).otherwise(F.lit(0.0))
        + F.when(wlen_ok, F.lit(0.3)).otherwise(F.lit(0.0))
        + alpha_ratio * 0.3
    )
    return F.round(score.cast("double"), 4)


LINE_SPLIT_RE = r"[.!?]\s+|\n+"


def line_segments(col: str | Column = "text") -> Column:
    """T1 analog — positions-with-structure: segment text into sentence/
    paragraph lines (the engine's stand-in for the reference's geometric
    Δtop/Δleft line grouping, invoicenet/common/util.py:171-190; web text has
    no glyph geometry, so punctuation/newline boundaries are the structure).
    Returns array<string> of trimmed non-empty lines in reading order —
    downstream n-gram candidate windows run per line like the reference's
    per-line ngrams (util.py:196)."""
    c = F.col(col) if isinstance(col, str) else col
    parts = F.transform(F.split(c, LINE_SPLIT_RE), lambda p: F.trim(p))
    return F.filter(parts, lambda p: p != F.lit(""))


def fingerprint(col: str | Column = "text") -> Column:
    """Document fingerprint: md5 of the squeezed-lowercased text — identical
    in DuckDB (md5()) for oracle checks. (xxhash64 is used internally for
    partitioning; md5 here because the oracle must reproduce it.)"""
    c = F.col(col) if isinstance(col, str) else col
    canon = F.regexp_replace(F.lower(c), r"\s+", " ")
    return F.md5(F.encode(F.trim(canon), "utf-8"))
