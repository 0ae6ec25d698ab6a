"""Trusted single-process BM25 oracle (pure Python/numpy, no Spark).

SURVEY.md §5: the reference ships no test suite, so correctness is anchored
to (a) this exhaustive oracle for rank-identity and (b) DuckDB SQL for the
relational subset. The oracle deliberately shares only the *formula* module
(index/bm25.py) with the engine — tokenization, counting, and top-k are
re-implemented independently here so a bug in the engine's pipeline can't
self-confirm.
"""

from __future__ import annotations

import re
from collections import Counter

import numpy as np

from invoicenet_spark.index import bm25

_TOKEN_RE = re.compile(r"[^a-z0-9]+")


def tokenize(text: str) -> list[str]:
    return [t for t in _TOKEN_RE.split(text.lower()) if t]


class NumpyBM25Oracle:
    """Build from (doc_id, text) pairs; answer AND/OR top-k queries."""

    def __init__(self, docs: dict[int, str], k1: float = bm25.K1, b: float = bm25.B):
        self.k1, self.b = k1, b
        self.doc_ids = np.array(sorted(docs), dtype=np.int64)
        self._texts = dict(docs)
        self.postings: dict[str, dict[int, int]] = {}
        self.doc_len: dict[int, int] = {}
        for doc_id, text in docs.items():
            toks = tokenize(text)
            self.doc_len[doc_id] = len(toks)
            for term, tf in Counter(toks).items():
                self.postings.setdefault(term, {})[doc_id] = tf
        self.N = len(docs)
        self.avgdl = float(np.mean([self.doc_len[d] for d in docs])) if docs else 0.0

    def score_all(self, terms: list[str]) -> dict[int, float]:
        """Exhaustive disjunctive scores for every matching doc."""
        scores: dict[int, float] = {}
        for term in dict.fromkeys(terms):  # unique, order-preserving
            plist = self.postings.get(term)
            if not plist:
                continue
            w = bm25.idf(self.N, len(plist))
            for doc_id, tf in plist.items():
                s = w * bm25.tf_score(
                    np.float64(tf), np.float64(self.doc_len[doc_id]), self.avgdl, self.k1, self.b
                )
                scores[doc_id] = scores.get(doc_id, 0.0) + float(s)
        return scores

    def topk(self, terms: list[str], k: int = 10, mode: str = "OR") -> list[tuple[int, float]]:
        """[(doc_id, score)] sorted by score desc, doc_id asc."""
        if mode == "PHRASE":
            return self.phrase_topk(terms, k)
        uniq = list(dict.fromkeys(terms))
        scores = self.score_all(uniq)
        if mode == "AND":
            keep = None
            for term in uniq:
                ids = set(self.postings.get(term, {}))
                keep = ids if keep is None else keep & ids
            scores = {d: s for d, s in scores.items() if d in (keep or set())}
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]

    def phrase_topk(self, terms: list[str], k: int = 10) -> list[tuple[int, float]]:
        """Exact phrase filter (token adjacency) + BM25 over distinct terms.

        Independent implementation: re-tokenizes each doc and scans for the
        literal token subsequence — no positional index involved."""
        if not terms:
            return []
        matches = []
        for doc_id, text in self._texts.items():
            toks = tokenize(text)
            n = len(terms)
            if any(
                toks[i : i + n] == terms for i in range(0, max(len(toks) - n + 1, 0))
            ):
                matches.append(doc_id)
        scores = self.score_all(list(dict.fromkeys(terms)))
        ranked = sorted(
            ((d, scores[d]) for d in matches), key=lambda kv: (-kv[1], kv[0])
        )
        return ranked[:k]
