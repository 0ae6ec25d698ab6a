"""Deterministic synthetic `pages` corpus + reference query set.

Schema mandated by BASELINE.json `input_hint`:
    pages(url string, warc_ts timestamp, html binary, text string, lang string)

Every row is a pure function of (seed, doc_seq) — a per-doc PCG64 stream
seeded with [seed, doc_seq] — so the corpus is identical no matter how many
partitions generate it. This mirrors the reference's seeded synthetic golden
generators (invoicenet/parsing/amount_generator.py, date_generator.py), which
define semantics *as data* (SURVEY.md §5).

Skew fixture: ~5% of docs get heavy stopword repetition, making the head
vocab terms Zipfian-hot — the two-cluster-size skew risk the north_rule
requires the index build to survive.
"""

from __future__ import annotations

import string

import numpy as np
import pandas as pd

VOCAB_SIZE = 10_000
EPOCH = np.datetime64("2024-01-01T00:00:00")
# Empty <title>: the fixture text is single-spaced alnum words, so BOTH
# extraction strategies (body_p capture, strip_tags general extractor —
# the engine default) recover the `text` column byte-identically, keeping
# every extraction-built index comparable to text-based oracles under
# either strategy.
_HTML_TMPL = "<html><head><title></title></head><body><p>{text}</p></body></html>"

# Zipf exponent for term draws (classic web-text shape).
_ZIPF_S = 1.07


def make_vocab(seed: int = 42, size: int = VOCAB_SIZE) -> np.ndarray:
    """Deterministic vocabulary: `size` distinct lowercase-ascii words.

    Rank 0..2 are designated stopword-like hot terms. Words are alnum-only
    so the analyzer round-trips exactly.
    """
    rng = np.random.default_rng(seed)
    letters = np.array(list(string.ascii_lowercase))
    seen: set[str] = set()
    words: list[str] = []
    while len(words) < size:
        lengths = rng.integers(3, 10, size=size)
        for ln in lengths:
            w = "".join(letters[rng.integers(0, 26, size=ln)])
            if w not in seen:
                seen.add(w)
                words.append(w)
                if len(words) == size:
                    break
    return np.array(words)


def _zipf_probs(size: int) -> np.ndarray:
    ranks = np.arange(1, size + 1, dtype=np.float64)
    p = 1.0 / ranks**_ZIPF_S
    return p / p.sum()


def gen_doc(seed: int, doc_seq: int, vocab: np.ndarray, probs: np.ndarray) -> dict:
    """One pages row, pure function of (seed, doc_seq)."""
    rng = np.random.default_rng([seed, doc_seq])
    n_tokens = int(rng.integers(20, 401))
    idx = rng.choice(len(vocab), size=n_tokens, p=probs)
    tokens = vocab[idx]
    if rng.random() < 0.05:  # hot-term skew fixture
        n_rep = int(rng.integers(100, 300))
        hot = vocab[rng.integers(0, 3, size=n_rep)]
        tokens = np.concatenate([hot, tokens])
    text = " ".join(tokens)
    r = rng.random()
    lang = "en" if r < 0.90 else ("de" if r < 0.94 else ("fr" if r < 0.97 else "xx"))
    site_id = doc_seq % 97
    url = f"https://site{site_id}.example/p/{doc_seq}"
    html = _HTML_TMPL.format(text=text).encode("utf-8")
    return {
        "url": url,
        "warc_ts": EPOCH + np.timedelta64(doc_seq, "s"),
        "html": html,
        "text": text,
        "lang": lang,
    }


def gen_pages_pandas(n_docs: int, seed: int = 42, start: int = 0) -> pd.DataFrame:
    """Driver-side generation (tests, tiny corpora)."""
    vocab = make_vocab(seed)
    probs = _zipf_probs(len(vocab))
    rows = [gen_doc(seed, i, vocab, probs) for i in range(start, start + n_docs)]
    df = pd.DataFrame(rows)
    df["warc_ts"] = pd.to_datetime(df["warc_ts"])
    return df


PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def gen_pages_spark(spark, n_docs: int, seed: int = 42, partitions: int = 32, start: int = 0):
    """Distributed generation: spark.range → mapInPandas, one doc per id.

    Because each row depends only on (seed, id), output is identical for any
    partition count — the property the N-vs-1-partition index-equivalence
    test relies on.
    """

    def gen(batches):
        vocab = make_vocab(seed)
        probs = _zipf_probs(len(vocab))
        for pdf in batches:
            rows = [gen_doc(seed, int(i), vocab, probs) for i in pdf["id"]]
            out = pd.DataFrame(rows)
            out["warc_ts"] = pd.to_datetime(out["warc_ts"])
            yield out

    return (
        spark.range(start, start + n_docs, 1, partitions)
        .mapInPandas(gen, schema=PAGES_SCHEMA)
    )


def gen_queries(n_queries: int = 100, seed: int = 42) -> pd.DataFrame:
    """Reference query set (FIXTURES.md §2): (query_id, terms, mode, k).

    1–4 terms each; mix of head/mid/tail vocab ranks; the first 10 queries
    are guaranteed to contain a hot (rank<3) term; AND/OR 50/50; k=10.
    """
    vocab = make_vocab(seed)
    rng = np.random.default_rng([seed, 7_777])
    rows = []
    for qid in range(1, n_queries + 1):
        n_terms = int(rng.integers(1, 5))
        band = rng.random(n_terms)
        ranks = np.where(
            band < 0.25,
            rng.integers(0, 10, size=n_terms),
            np.where(
                band < 0.65,
                rng.integers(10, 1000, size=n_terms),
                rng.integers(1000, len(vocab), size=n_terms),
            ),
        )
        if qid <= 10:
            ranks[0] = int(rng.integers(0, 3))  # guaranteed hot term
        terms = list(dict.fromkeys(vocab[ranks]))  # dedupe, keep order
        rows.append(
            {
                "query_id": qid,
                "terms": terms,
                "mode": "AND" if rng.random() < 0.5 else "OR",
                "k": 10,
            }
        )
    return pd.DataFrame(rows)
