"""Kernel-level microbench for round 5's boolean-tree block-max pruning.

Builds shard-sized posting lists and times three routings of the SAME
fielded-style disjunction tree (the shape every bare query on a fielded
index rewrites to via qualify_bare_leaves):

  tree_walk       — round-4 path: exhaustive evaluate_shard + root top-k
  flat_exhaustive — evaluate_shard_topk(kernel='exhaustive') (flat kernel)
  pruned          — evaluate_shard_topk(kernel='auto') → score_blockmax

Fixtures mirror BENCH/BASELINE.md §3's kernel microbench: (a) skewed —
1M-posting stopword + 200-posting rare term, two field-leaves each (the
case the round-4 verdict flagged: fielded indexes gave up the 17× MaxScore
win); (b) flat — 3 lists × 300k postings, where pruning can't bite and the
guard must bail to ~exhaustive cost.

Writes BENCH/BOOLTREE_PRUNE.json. Medians of --reps runs (default 7).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from invoicenet_spark.index.codec import encode_posting_list
from invoicenet_spark.query import booltree, kernels

K1, B = 1.2, 0.75
BLOCK = 128


def make_list(rng, n_docs, df, tid, dls, avgdl):
    docs = np.sort(rng.choice(n_docs, size=df, replace=False)).astype(np.int64)
    tfs = rng.integers(1, 8, size=df).astype(np.int64)
    row = encode_posting_list(docs, tfs, dls[docs], block_size=BLOCK)
    row["term_id"] = tid
    idf = float(np.log((n_docs - df + 0.5) / (df + 0.5) + 1.0))
    return kernels.TermPostings(row, idf=idf, avgdl=avgdl, k1=K1, b=B)


def field_tree(pairs, avgdl):
    """OR over (tid, weight) groups of two field leaves each — exactly the
    qualify_bare_leaves / fielded_tree output shape."""
    groups = []
    for tids, w in pairs:
        groups.append({
            "kind": "or",
            "clauses": [
                {"kind": "term", "term": f"t{t}", "tid": t, "boost": w,
                 "avgdl": avgdl * f}
                for t, f in zip(tids, (0.3, 1.1))  # title short, body long
            ],
        })
    return {"kind": "or", "clauses": groups}


def run(fn, reps):
    fn()  # warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def tree_walk(tree, by_tid, k):
    d, s = booltree.evaluate_shard(tree, by_tid)
    return kernels.topk_select(d, s, k)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=7)
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()
    rng = np.random.default_rng(7)
    out = {}

    # (a) skewed: stopword (1M) + rare (200), two field leaves each
    n_docs = 1_200_000
    dls = rng.integers(20, 400, size=n_docs).astype(np.int64)
    avgdl = float(dls.mean())
    by_tid = {
        0: make_list(rng, n_docs, 1_000_000, 0, dls, avgdl),  # title:stop
        1: make_list(rng, n_docs, 1_000_000, 1, dls, avgdl),  # body:stop
        2: make_list(rng, n_docs, 200, 2, dls, avgdl),        # title:rare
        3: make_list(rng, n_docs, 200, 3, dls, avgdl),        # body:rare
    }
    tree = field_tree([((2, 3), 2.0), ((0, 1), 1.0)], avgdl)
    k = args.k
    r = {}
    r["tree_walk_ms"] = round(1e3 * run(lambda: tree_walk(tree, by_tid, k), args.reps), 2)
    r["flat_exhaustive_ms"] = round(1e3 * run(
        lambda: booltree.evaluate_shard_topk(tree, by_tid, k, kernel="exhaustive"),
        args.reps), 2)
    r["pruned_ms"] = round(1e3 * run(
        lambda: booltree.evaluate_shard_topk(tree, by_tid, k), args.reps), 2)
    # rank identity on this fixture
    ed, es = tree_walk(tree, by_tid, k)
    gd, gs = booltree.evaluate_shard_topk(tree, by_tid, k)
    assert np.array_equal(ed, gd) and np.allclose(es, gs, rtol=1e-12)
    r["speedup_vs_tree_walk"] = round(r["tree_walk_ms"] / r["pruned_ms"], 2)
    out["skewed_stopword_rare_fielded"] = r

    # (b) flat: 3 × 300k — pruning can't bite; guard must keep ~parity
    n_docs = 400_000
    dls = rng.integers(20, 400, size=n_docs).astype(np.int64)
    avgdl = float(dls.mean())
    by_tid = {i: make_list(rng, n_docs, 300_000, i, dls, avgdl) for i in range(3)}
    tree = {"kind": "or", "clauses": [
        {"kind": "term", "term": f"t{i}", "tid": i, "boost": 1.0} for i in range(3)
    ]}
    r = {}
    r["tree_walk_ms"] = round(1e3 * run(lambda: tree_walk(tree, by_tid, k), args.reps), 2)
    r["flat_exhaustive_ms"] = round(1e3 * run(
        lambda: booltree.evaluate_shard_topk(tree, by_tid, k, kernel="exhaustive"),
        args.reps), 2)
    r["pruned_ms"] = round(1e3 * run(
        lambda: booltree.evaluate_shard_topk(tree, by_tid, k), args.reps), 2)
    r["pruned_vs_flat_exhaustive"] = round(r["pruned_ms"] / r["flat_exhaustive_ms"], 3)
    out["flat_3x300k"] = r

    # (c) conjunctive skewed: rare AND stopword, fielded (2 groups × 2
    # field leaves) — the round-5 score_and_groups target: the tree walk
    # decodes both 1M stopword lists; the conjunctive probe decodes the
    # rare group and block-probes the stopword group at its candidates
    n_docs = 1_200_000
    dls = rng.integers(20, 400, size=n_docs).astype(np.int64)
    avgdl = float(dls.mean())
    by_tid = {
        0: make_list(rng, n_docs, 1_000_000, 0, dls, avgdl),
        1: make_list(rng, n_docs, 1_000_000, 1, dls, avgdl),
        2: make_list(rng, n_docs, 200, 2, dls, avgdl),
        3: make_list(rng, n_docs, 200, 3, dls, avgdl),
    }
    tree = {"kind": "and", "clauses": field_tree(
        [((2, 3), 2.0), ((0, 1), 1.0)], avgdl)["clauses"]}
    r = {}
    r["tree_walk_ms"] = round(1e3 * run(lambda: tree_walk(tree, by_tid, k), args.reps), 2)
    r["pruned_ms"] = round(1e3 * run(
        lambda: booltree.evaluate_shard_topk(tree, by_tid, k), args.reps), 2)
    ed, es = tree_walk(tree, by_tid, k)
    gd, gs = booltree.evaluate_shard_topk(tree, by_tid, k)
    assert np.array_equal(ed, gd) and np.allclose(es, gs, rtol=1e-12)
    r["speedup_vs_tree_walk"] = round(r["tree_walk_ms"] / r["pruned_ms"], 2)
    out["skewed_and_stopword_rare_fielded"] = r

    # (d) flat AND rare+stopword: previously full-decode intersect-then-
    # score; now the conjunctive probe skips the stopword decode
    kernels_plists = [by_tid[0], by_tid[2]]  # stopword AND rare (plain)
    r = {}
    r["exhaustive_and_ms"] = round(1e3 * run(
        lambda: kernels.score_exhaustive(kernels_plists, k, "AND"), args.reps), 2)
    r["probe_and_ms"] = round(1e3 * run(
        lambda: kernels.score_and_groups([[p] for p in kernels_plists], k),
        args.reps), 2)
    ed, es = kernels.score_exhaustive(kernels_plists, k, "AND")
    gd, gs = kernels.score_and_groups([[p] for p in kernels_plists], k)
    assert np.array_equal(ed, gd) and np.array_equal(es, gs)
    r["speedup"] = round(r["exhaustive_and_ms"] / r["probe_and_ms"], 2)
    out["flat_and_stopword_rare"] = r

    # (e) pigeonhole minimum_should_match: rare OR rare2 OR stopword, m=2 —
    # candidates = union of the two rare lists; the stopword list is only
    # membership-probed at those candidates
    mm_plists = [by_tid[2], by_tid[3], by_tid[0]]  # rare, rare, stopword
    r = {}
    r["exhaustive_mm_ms"] = round(1e3 * run(
        lambda: kernels.score_exhaustive(mm_plists, k, "OR", min_match=2),
        args.reps), 2)
    r["pigeonhole_mm_ms"] = round(1e3 * run(
        lambda: kernels.score_and_groups(
            [[p] for p in mm_plists], k, min_groups=2),
        args.reps), 2)
    ed, es = kernels.score_exhaustive(mm_plists, k, "OR", min_match=2)
    gd, gs = kernels.score_and_groups([[p] for p in mm_plists], k, min_groups=2)
    assert np.array_equal(ed, gd) and np.array_equal(es, gs)
    r["speedup"] = round(r["exhaustive_mm_ms"] / r["pigeonhole_mm_ms"], 2)
    out["min_match_2of3_rare_rare_stopword"] = r

    # (f) OR carrying a phrase leaf: the phrase pre-evaluates over its own
    # (rare) terms; the stopword TERM leaf keeps MaxScore pruning via
    # score_mixed_or — previously the phrase dragged the whole OR onto the
    # exhaustive walk, full stopword decode included
    from invoicenet_spark.index.codec import vb_encode

    def make_positional(df, tid, docs=None):
        d = (np.sort(rng.choice(n_docs, size=df, replace=False)).astype(np.int64)
             if docs is None else docs)
        poss = [np.sort(rng.choice(200, size=int(rng.integers(1, 4)),
                                   replace=False)).astype(np.int64) for _ in d]
        tfs = np.array([len(p) for p in poss], dtype=np.int64)
        row = encode_posting_list(d, tfs, dls[d], block_size=BLOCK)
        pos_flat = np.concatenate(poss).astype(np.int64)
        p_cum = np.concatenate(([0], np.cumsum(tfs)))
        pdeltas = np.diff(pos_flat, prepend=np.int64(0))
        pdeltas[p_cum[:-1]] = pos_flat[p_cum[:-1]]
        row["pos_blob"] = vb_encode(pdeltas.astype(np.uint64))
        row["term_id"] = tid
        idf = float(np.log((n_docs - df + 0.5) / (df + 0.5) + 1.0))
        return kernels.TermPostings(row, idf=idf, avgdl=avgdl, k1=1.2, b=0.75)

    shared = np.sort(rng.choice(n_docs, size=200, replace=False)).astype(np.int64)
    by_tid[4] = make_positional(200, 4, docs=shared)
    # t5 occurs at t4's position + 1 in every shared doc → the phrase
    # actually matches (theta needs >= k real matches to prune with)
    t4_pos, t4_off = by_tid[4].decode_positions(by_tid[4].decode_all()[1])
    poss5 = [t4_pos[t4_off[i]:t4_off[i + 1]] + 1 for i in range(shared.size)]
    from invoicenet_spark.index.codec import vb_encode as _vb
    tfs5 = np.array([len(p) for p in poss5], dtype=np.int64)
    row5 = encode_posting_list(shared, tfs5, dls[shared], block_size=BLOCK)
    pos_flat = np.concatenate(poss5).astype(np.int64)
    p_cum = np.concatenate(([0], np.cumsum(tfs5)))
    pdeltas = np.diff(pos_flat, prepend=np.int64(0))
    pdeltas[p_cum[:-1]] = pos_flat[p_cum[:-1]]
    row5["pos_blob"] = _vb(pdeltas.astype(np.uint64))
    row5["term_id"] = 5
    idf5 = float(np.log((n_docs - 200 + 0.5) / (200 + 0.5) + 1.0))
    by_tid[5] = kernels.TermPostings(row5, idf=idf5, avgdl=avgdl, k1=1.2, b=0.75)
    tree = {"kind": "or", "clauses": [
        {"kind": "term", "term": "t0", "tid": 0, "boost": 1.0},  # stopword
        {"kind": "phrase", "tids": [4, 5], "terms": ["t4", "t5"],
         "slop": 0, "ordered": True, "boost": 2.0},
    ]}
    r = {}
    r["tree_walk_ms"] = round(1e3 * run(lambda: tree_walk(tree, by_tid, k), args.reps), 2)
    r["pruned_ms"] = round(1e3 * run(
        lambda: booltree.evaluate_shard_topk(tree, by_tid, k), args.reps), 2)
    ed, es = tree_walk(tree, by_tid, k)
    gd, gs = booltree.evaluate_shard_topk(tree, by_tid, k)
    assert np.array_equal(ed, gd) and np.allclose(es, gs, rtol=1e-12)
    r["speedup_vs_tree_walk"] = round(r["tree_walk_ms"] / r["pruned_ms"], 2)
    out["mixed_or_stopword_plus_phrase"] = r

    # (g) OR carrying an AND subtree — the dismax shape `stopword OR
    # (rare AND stopword2)`: the AND materializes via the block-probed
    # conjunction kernel (stopword2 never fully decoded), and the sibling
    # stopword TERM leaf is MaxScore-pruned against the AND's exact upper
    # bound — previously the whole tree walked, decoding BOTH 1M lists
    tree = {"kind": "or", "clauses": [
        {"kind": "term", "term": "t0", "tid": 0, "boost": 1.0},  # stopword
        {"kind": "and", "clauses": [
            {"kind": "term", "term": "t2", "tid": 2, "boost": 2.0},  # rare
            {"kind": "term", "term": "t1", "tid": 1, "boost": 1.0},  # stopword2
        ]},
    ]}
    r = {}
    r["tree_walk_ms"] = round(1e3 * run(lambda: tree_walk(tree, by_tid, k), args.reps), 2)
    r["pruned_ms"] = round(1e3 * run(
        lambda: booltree.evaluate_shard_topk(tree, by_tid, k), args.reps), 2)
    ed, es = tree_walk(tree, by_tid, k)
    gd, gs = booltree.evaluate_shard_topk(tree, by_tid, k)
    assert np.array_equal(ed, gd) and np.allclose(es, gs, rtol=1e-12)
    r["speedup_vs_tree_walk"] = round(r["tree_walk_ms"] / r["pruned_ms"], 2)
    out["mixed_or_stopword_plus_and_subtree"] = r

    os.makedirs("BENCH", exist_ok=True)
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "BENCH", "BOOLTREE_PRUNE.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
