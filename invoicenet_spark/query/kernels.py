"""Pure numpy query kernels: gallop intersection, exhaustive scoring, and
block-max WAND. No Spark imports — unit-testable standalone; exec.py wraps
them in applyInPandas.

Reference analog (SURVEY.md §2.6 J4, §2.7 A1, §2.8 K1): the query-term ∩
candidate intersection is the reference's memory-mask (model.py:124-125);
scoring is the masked global softmax (sum of per-candidate partials,
model.py:127-131); top-k generalizes the argmax decode (acp.py:117).
WAND pruning ≈ masking non-candidates before the softmax.

Block-max WAND follows Ding & Suel (SIGIR 2011): document-at-a-time pivot
selection on list upper bounds, with per-block (max_tf, min_dl) bounds
(codec.py) for the shallow check; the control loop is per *evaluated
candidate* (already pruned), all decode/score math inside is vectorized.
"""

from __future__ import annotations

import numpy as np

from invoicenet_spark.index import bm25
from invoicenet_spark.index.codec import decode_block, decode_positions, decode_posting_list


def gallop_intersect(lists: list[np.ndarray]) -> np.ndarray:
    """Intersect sorted int64 arrays, smallest-first, via vectorized binary
    search (np.searchsorted == batched galloping)."""
    lists = sorted(lists, key=len)
    out = lists[0]
    for arr in lists[1:]:
        if out.size == 0:
            return out
        idx = np.searchsorted(arr, out)
        idx_c = np.minimum(idx, arr.size - 1)
        out = out[arr[idx_c] == out]
    return out


def topk_select(doc_ids: np.ndarray, scores: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Top-k by (score desc, doc_id asc) — deterministic tie-break."""
    if doc_ids.size == 0:
        return doc_ids[:0], scores[:0]
    k = min(k, doc_ids.size)
    # argpartition on composite: sort by (-score, doc_id) via lexsort
    order = np.lexsort((doc_ids, -scores))[:k]
    return doc_ids[order], scores[order]


class TermPostings:
    """Decoded-on-demand view over one (term, shard) posting row dict."""

    def __init__(self, row: dict, idf: float, avgdl: float, k1: float, b: float):
        self.row = row
        self.idf = float(idf)
        self.avgdl = avgdl
        self.k1, self.b = k1, b
        self.block_last = np.asarray(row["block_last"], dtype=np.int64)
        self.n_blocks = self.block_last.size
        # list-level upper bound = max over block bounds
        self.block_ub = bm25.block_upper_bound(
            self.idf,
            np.asarray(row["block_max_tf"], dtype=np.float64),
            np.asarray(row["block_min_dl"], dtype=np.float64),
            avgdl,
            k1,
            b,
        )
        self.list_ub = float(self.block_ub.max())

    def decode_all(self) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        return decode_posting_list(self.row)

    def decode_one_block(self, i: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        return decode_block(self.row, i)

    def decode_positions(self, tfs: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        return decode_positions(self.row, tfs)


def score_exhaustive(
    plists: list[TermPostings],
    k: int,
    mode: str = "OR",
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized exhaustive scoring of one shard.

    Posting rows are self-contained (per-posting doc_len stream), so no
    forward-index side input is needed. Deterministic accumulation:
    per-term partials added in caller-supplied list order (callers sort
    by term_id).
    """
    if not plists:
        return np.zeros(0, dtype=np.int64), np.zeros(0)
    decoded = [tp.decode_all() for tp in plists]

    if mode == "AND":
        # intersect-then-score: gallop the doc sets first, then gather
        # (tf, dl) for survivors only — skips scoring the union
        keep = gallop_intersect([d[0] for d in decoded])
        if keep.size == 0:
            return np.zeros(0, dtype=np.int64), np.zeros(0)
        agg = np.zeros(keep.size, dtype=np.float64)
        for tp, (docs, tfs, dls) in zip(plists, decoded):
            j = np.searchsorted(docs, keep)
            agg += tp.idf * bm25.tf_score(tfs[j], dls[j], tp.avgdl, tp.k1, tp.b)
        return topk_select(keep, agg, k)

    all_docs, all_scores = [], []
    for tp, (docs, tfs, dls) in zip(plists, decoded):
        s = tp.idf * bm25.tf_score(tfs, dls, tp.avgdl, tp.k1, tp.b)
        all_docs.append(docs)
        all_scores.append(s)
    docs_cat = np.concatenate(all_docs)
    scores_cat = np.concatenate(all_scores)
    uniq, inv = np.unique(docs_cat, return_inverse=True)
    agg = np.zeros(uniq.size, dtype=np.float64)
    np.add.at(agg, inv, scores_cat)
    return topk_select(uniq, agg, k)


def score_phrase(
    plists_by_qpos: list[TermPostings],
    k: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Exact phrase query over a positional index.

    plists_by_qpos: one posting view per phrase slot, in phrase order
    (repeated terms appear once per slot). A doc matches iff some position
    p has slot i's term at p+i for every i. Matching docs are then scored
    with plain BM25 over the phrase's distinct terms (standard semantics:
    the phrase is a filter, not a scoring unit).
    """
    if not plists_by_qpos:
        return np.zeros(0, dtype=np.int64), np.zeros(0)
    decoded = [tp.decode_all() for tp in plists_by_qpos]
    positions = [
        tp.decode_positions(decoded[i][1]) for i, tp in enumerate(plists_by_qpos)
    ]
    cand = gallop_intersect([d[0] for d in decoded])
    matches = []
    for doc in cand:
        S = None
        for i, (docs_i, _, _) in enumerate(decoded):
            j = int(np.searchsorted(docs_i, doc))
            pos_flat, off = positions[i]
            P = pos_flat[off[j] : off[j + 1]] - i
            S = P if S is None else np.intersect1d(S, P, assume_unique=True)
            if S.size == 0:
                break
        if S is not None and S.size:
            matches.append(int(doc))
    if not matches:
        return np.zeros(0, dtype=np.int64), np.zeros(0)
    match_arr = np.asarray(matches, dtype=np.int64)

    # BM25 over distinct terms (a slot's term may repeat), restricted to
    # phrase matches; accumulated in deterministic term_id order.
    scores = np.zeros(match_arr.size, dtype=np.float64)
    by_tid = {int(tp.row["term_id"]): (tp, dec) for tp, dec in zip(plists_by_qpos, decoded)}
    for tid in sorted(by_tid):
        tp, (docs_i, tfs_i, dls_i) = by_tid[tid]
        j = np.searchsorted(docs_i, match_arr)
        scores += tp.idf * bm25.tf_score(tfs_i[j], dls_i[j], tp.avgdl, tp.k1, tp.b)
    return topk_select(match_arr, scores, k)


def score_wand(
    plists: list[TermPostings],
    k: int,
    theta0: float = 0.0,
) -> tuple[np.ndarray, np.ndarray]:
    """Block-max WAND (disjunctive). Returns exactly the exhaustive top-k
    (bounds are conservative, pruning is lossless).

    Cursor state per list: current block index + decoded block arrays +
    position within block. The outer loop advances pivots; all arithmetic on
    decoded blocks is vectorized numpy.
    """
    n = len(plists)
    if n == 0:
        return np.zeros(0, dtype=np.int64), np.zeros(0)

    # cursor state
    blk = [0] * n  # current block index
    bdocs = [None] * n  # decoded docs of current block
    btfs = [None] * n
    bdls = [None] * n
    pos = [0] * n  # index within current block
    exhausted = [False] * n

    def current_doc(i: int) -> int:
        if exhausted[i]:
            return np.iinfo(np.int64).max
        if bdocs[i] is None:
            bdocs[i], btfs[i], bdls[i] = plists[i].decode_one_block(blk[i])
        return int(bdocs[i][pos[i]])

    def advance_to(i: int, target: int) -> None:
        """Move cursor i to first doc >= target (skip whole blocks first)."""
        if exhausted[i]:
            return
        tp = plists[i]
        # skip blocks whose last doc < target
        nb = tp.n_blocks
        j = blk[i]
        if tp.block_last[nb - 1] < target:
            exhausted[i] = True
            return
        j2 = int(np.searchsorted(tp.block_last, target, side="left"))
        if j2 != j or bdocs[i] is None:
            blk[i] = j2
            bdocs[i], btfs[i], bdls[i] = tp.decode_one_block(j2)
            pos[i] = 0
        p = int(np.searchsorted(bdocs[i], target, side="left"))
        if p >= bdocs[i].size:  # target beyond this block (can't happen after block skip)
            exhausted[i] = True
            return
        pos[i] = p

    # top-k heap as arrays (k is small)
    heap_docs = np.empty(0, dtype=np.int64)
    heap_scores = np.empty(0, dtype=np.float64)
    theta = theta0

    ubs = np.array([tp.list_ub for tp in plists])

    while True:
        cur = np.array([current_doc(i) for i in range(n)], dtype=np.int64)
        if (cur == np.iinfo(np.int64).max).all():
            break
        order = np.argsort(cur, kind="stable")
        # pivot: first prefix whose UB sum exceeds theta
        acc = 0.0
        pivot_idx = -1
        for r, i in enumerate(order):
            if cur[i] == np.iinfo(np.int64).max:
                break
            acc += ubs[i]
            if acc > theta:
                pivot_idx = r
                break
        if pivot_idx < 0:
            break  # no doc can beat theta
        pivot_doc = int(cur[order[pivot_idx]])
        lead = [int(i) for i in order[: pivot_idx + 1] if cur[i] != np.iinfo(np.int64).max]

        # shallow (block-max) check: refine UB with current blocks at pivot
        bub = 0.0
        for i in lead:
            tp = plists[i]
            j = int(np.searchsorted(tp.block_last, pivot_doc, side="left"))
            if j < tp.n_blocks:
                bub += float(tp.block_ub[j])
        if bub <= theta:
            # can't qualify: advance the lead cursor past min(block boundaries)
            nxt = pivot_doc + 1
            bounds = []
            for i in lead:
                tp = plists[i]
                j = int(np.searchsorted(tp.block_last, pivot_doc, side="left"))
                if j < tp.n_blocks:
                    bounds.append(int(tp.block_last[j]))
            if bounds:
                nxt = max(nxt, min(bounds) + 1)
            for i in lead:
                advance_to(i, nxt)
            continue

        if int(cur[order[0]]) == pivot_doc:
            # all leading cursors aligned on pivot → fully score it
            score = 0.0
            # deterministic order: by list index (caller sorts terms)
            for i in range(n):
                if not exhausted[i] and current_doc(i) == pivot_doc:
                    tf = float(btfs[i][pos[i]])
                    dl = float(bdls[i][pos[i]])
                    score += plists[i].idf * float(
                        bm25.tf_score(np.float64(tf), np.float64(dl), plists[i].avgdl,
                                      plists[i].k1, plists[i].b)
                    )
            # insert into top-k
            heap_docs = np.append(heap_docs, pivot_doc)
            heap_scores = np.append(heap_scores, score)
            if heap_docs.size > k:
                keep = np.lexsort((heap_docs, -heap_scores))[:k]
                heap_docs, heap_scores = heap_docs[keep], heap_scores[keep]
            if heap_docs.size == k:
                theta = float(heap_scores.min())
            # advance all cursors sitting on pivot
            for i in range(n):
                if not exhausted[i] and current_doc(i) == pivot_doc:
                    pos[i] += 1
                    if pos[i] >= bdocs[i].size:
                        blk[i] += 1
                        pos[i] = 0
                        bdocs[i] = None
                        if blk[i] >= plists[i].n_blocks:
                            exhausted[i] = True
        else:
            # advance cursors before the pivot up to it
            for i in lead:
                if int(cur[i]) < pivot_doc:
                    advance_to(i, pivot_doc)

    return topk_select(heap_docs, heap_scores, k)
