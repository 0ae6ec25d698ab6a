"""Federated search across segment indexes (the crawl-segment topology).

At 10^12 documents nobody builds ONE index: Common Crawl ships a new crawl
every few weeks, and the production shape is one self-contained index per
crawl segment (each built/committed/compacted independently — exactly what
`build_index` produces), queried together. This module is the
MultiReader / cross-index-search analog (Lucene MultiSearcher, ES
`dfs_query_then_fetch`):

  1. **segment pruning** — each index records its corpus time range
     (stats.json ts_min/ts_max, from the docs table's warc_ts); a query
     with a time window skips whole segments whose range misses it. The
     partition-pruning idea, lifted to whole indexes: a 3-year archive
     queried for last month touches ~1/36 of its segments.
  2. **global statistics** — BM25 idf and length normalization use the
     UNION corpus: N = Σ N_i, avgdl = Σ dl_i / N, df(term) = Σ df_i(term).
     This is ES `dfs_query_then_fetch` (the extra stats round-trip that
     makes cross-index scores comparable); with per-segment stats a rare
     term in a small fresh segment would out-score the same term in the
     big archive. Result: federated top-k over segments carries the exact
     per-query score sequence of a single index built over the union
     corpus, and at exhaustive k the exact match set (pinned by test).
     The one thing NOT preserved is ordering WITHIN a tied score group:
     the union index tie-breaks on doc_id (whose order is the
     (hash-bucket, url) order of functions/ids.py), federation on url —
     the same no-guarantee ES gives for ties across shards; the federated
     order (score desc, url asc) is itself deterministic.
  3. **scatter-gather merge** — each segment answers the batch with its
     own per-shard kernels (every pruning path intact: the segment search
     IS `exec.search` on a stats-overridden handle), producing ≤ k rows
     per (query, segment); the global merge re-ranks the union by
     (score desc, url asc) and keeps k. Merge input is ≤ k·n_segments
     rows per query — never proportional to corpus size.

Scale shape: the per-segment searches are independent Spark jobs over
disjoint data (on a cluster: disjoint executors / one cluster per live
segment if desired); the only cross-segment exchanges are the
dictionary-sized df union and the k·n_segments-row merge. Global-df for a
query term the segment lacks is still correct: the segment's terms frame
simply has no row, so the term scores only where it exists, with the
union-corpus idf.

Not supported across segments (v1, documented): fielded indexes (per-field
avgdl union needs per-field n_docs weighting — segment-local today),
search_after cursors (doc_ids are segment-local, so a cursor is ambiguous
at the federation level; paginate per segment or raise k).
"""

from __future__ import annotations

import dataclasses
from functools import reduce

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from invoicenet_spark.query import exec as qexec


def _overlaps(ts_min, ts_max, ts_from, ts_to) -> bool:
    """Segment [ts_min, ts_max] vs query window [ts_from, ts_to]; a segment
    with no recorded range is never pruned (unknown ⊇ any window)."""
    if ts_min is None or ts_max is None:
        return True
    lo, hi = pd.Timestamp(ts_min), pd.Timestamp(ts_max)
    if ts_from is not None and hi < pd.Timestamp(ts_from):
        return False
    if ts_to is not None and lo > pd.Timestamp(ts_to):
        return False
    return True


class FederatedIndex:
    """A set of segment indexes searched as one corpus.

    Holds the loaded per-segment `exec.Index` handles plus the global
    statistics (computed once per handle — the dfs round-trip is paid at
    open, not per query): union N/avgdl from the segments' stats.json
    (no data scan — sum_dl = N_i · avgdl_i), and the union-df dictionary
    as a Spark frame (one dictionary-sized union+agg, cached).
    """

    def __init__(self, spark: SparkSession, roots: list[str]):
        if not roots:
            raise ValueError("FederatedIndex needs at least one segment root")
        self.spark = spark
        self.segments = [qexec.load_index(spark, r) for r in roots]
        for ix in self.segments:
            if ix.stats.get("fields"):
                raise NotImplementedError(
                    "federated search over fielded indexes is not supported "
                    "(per-field avgdl union is segment-local)"
                )
        cfg0 = (self.segments[0].stats["k1"], self.segments[0].stats["b"],
                self.segments[0].stats.get("token_pattern"))
        for ix in self.segments[1:]:
            cfg = (ix.stats["k1"], ix.stats["b"], ix.stats.get("token_pattern"))
            if cfg != cfg0:
                raise ValueError(
                    f"segment scoring configs differ ({cfg0} vs {cfg}) — "
                    "cross-segment scores would not be comparable"
                )
        n_total = sum(ix.stats["N"] for ix in self.segments)
        sum_dl = sum(ix.stats["N"] * ix.stats["avgdl"] for ix in self.segments)
        self.n_total = int(n_total)
        self.avgdl = float(sum_dl / n_total) if n_total else 0.0
        # stats-overridden handles per LIVE SET: time pruning restricts the
        # corpus, so scores must use the surviving-union's N/avgdl/df (a user
        # who queries only last month's crawls scores against that corpus,
        # and the pruned federation must equal a federation opened on the
        # surviving segments alone — pinned by test). Keyed by the live
        # tuple; the all-live entry is what unwindowed searches hit.
        self._global_cache: dict[tuple, list] = {}

    def global_segments(self, live: tuple[int, ...]) -> list:
        """Per-segment handles re-keyed to the live set's union statistics:
        same paths/postings/docs, but N/avgdl come from the summed
        stats.json values and each term's df from a dictionary-sized
        union+agg over the live segments' terms tables (cached — every
        search call's idf join reads it). exec.search on such a handle
        computes union-idf with zero changes — every kernel, pruning route,
        tombstone regime and filter applies per segment."""
        if live in self._global_cache:
            return self._global_cache[live]
        segs = [self.segments[i] for i in live]
        n_total = sum(ix.stats["N"] for ix in segs)
        sum_dl = sum(ix.stats["N"] * ix.stats["avgdl"] for ix in segs)
        avgdl = float(sum_dl / n_total) if n_total else 0.0
        df_union = (
            reduce(
                DataFrame.unionByName,
                [ix.terms.select("term", "df") for ix in segs],
            )
            .groupBy("term")
            .agg(F.sum("df").alias("df"))
            .cache()
        )
        out = [
            dataclasses.replace(
                ix,
                stats={**ix.stats, "N": int(n_total), "avgdl": avgdl},
                terms=ix.terms.drop("df")
                .join(df_union, "term", "left")
                .fillna(0, subset=["df"]),
                _local_dict=None,
                _fuzzy_vocab=None,
                _deleted_bc=None,
            )
            for ix in segs
        ]
        self._global_cache[live] = out
        return out

    def ts_range(self, i: int):
        s = self.segments[i].stats
        return s.get("ts_min"), s.get("ts_max")

    def live_segments(self, ts_from=None, ts_to=None) -> list[int]:
        """Segment indices surviving time pruning for [ts_from, ts_to]."""
        return [
            i
            for i in range(len(self.segments))
            if _overlaps(*self.ts_range(i), ts_from, ts_to)
        ]


def search_federated(
    spark: SparkSession,
    fed: FederatedIndex | list[str],
    queries: pd.DataFrame,
    ts_from=None,
    ts_to=None,
    kernel: str = "auto",
    with_url: bool = True,
    count_only: bool = False,
    matches_only: bool = False,
) -> DataFrame:
    """Batch top-k search across segment indexes (see module docstring).

    queries: the `exec.search` pandas contract — (query_id, terms, mode, k)
    plus the optional modifier columns. PREFIX/FUZZY expansion runs per
    segment against that segment's dictionary (the Lucene per-reader
    rewrite); expanded terms score with union idf.

    ts_from / ts_to (str | datetime | pd.Timestamp, either open): prune
    segments whose [ts_min, ts_max] misses the window BEFORE any Spark
    work. Pruning is segment-granular — docs inside a surviving segment
    are not time-filtered here (compose `doc_filter` per segment for
    that); stats stay the pruned-union's stats, matching a user who
    queries only the surviving crawls.

    Returns the `exec.search` result shape plus a `segment` column
    (position in fed.segments) so callers can route doc fetches:
      ranked:        (query_id, rank, segment, doc_id[, url], score)
      count_only:    (query_id, total_hits)
      matches_only:  (query_id, segment, doc_id, score)
    """
    if isinstance(fed, list):
        fed = FederatedIndex(spark, fed)
    if not isinstance(queries, pd.DataFrame):
        raise TypeError("search_federated takes a pandas query batch")
    for c in ("after_score", "after_doc"):
        if c in queries.columns and queries[c].notna().any():
            raise NotImplementedError(
                "search_after across segments is ambiguous (doc_ids are "
                "segment-local) — paginate per segment or raise k"
            )
    live = fed.live_segments(ts_from, ts_to)
    if not live:
        if count_only:
            return spark.createDataFrame(
                pd.DataFrame(
                    {"query_id": queries["query_id"].astype("int64"),
                     "total_hits": np.zeros(len(queries), dtype="int64")}
                )
            ).orderBy("query_id")
        return _empty_federated(spark, with_url, matches_only)

    handles = dict(zip(live, fed.global_segments(tuple(live))))
    per_seg = []
    for i in live:
        seg_ix = handles[i]
        res = qexec.search(
            spark, seg_ix, queries.copy(), kernel=kernel,
            with_url=with_url and not matches_only,
            count_only=count_only, matches_only=matches_only,
        )
        if not count_only:
            res = res.withColumn("segment", F.lit(i).cast("int"))
        per_seg.append(res)
    merged = reduce(DataFrame.unionByName, per_seg)

    if count_only:
        # segment corpora are disjoint — the union count is the sum
        return (
            merged.groupBy("query_id")
            .agg(F.sum("total_hits").cast("long").alias("total_hits"))
            .orderBy("query_id")
        )
    if matches_only:
        return merged.select("query_id", "segment", "doc_id", "score")

    # global merge: ≤ k rows per (query, segment) in, k out. Tie-break on
    # url — the only globally-unique key across segments (doc_ids are
    # segment-local). Deterministic, but a different total order within a
    # tied score group than exec.search's doc_id order (module docstring).
    order = [F.col("score").desc()] + (
        [F.col("url").asc()]
        if with_url
        else [F.col("segment").asc(), F.col("doc_id").asc()]
    )
    w = Window.partitionBy("query_id").orderBy(*order)
    ks = spark.createDataFrame(
        queries[["query_id", "k"]].astype({"query_id": "int64", "k": "int64"})
    )
    cols = ["query_id", "rank", "segment", "doc_id"] + (
        ["url"] if with_url else []
    ) + ["score"]
    return (
        merged.drop("rank")
        .withColumn("rank", F.row_number().over(w))
        .join(F.broadcast(ks), "query_id")
        .where(F.col("rank") <= F.col("k"))
        .select(*cols)
        .orderBy("query_id", "rank")
    )


def _empty_federated(spark, with_url: bool, matches_only: bool) -> DataFrame:
    if matches_only:
        return spark.createDataFrame(
            [], "query_id long, segment int, doc_id long, score double"
        )
    url = ", url string" if with_url else ""
    return spark.createDataFrame(
        [], f"query_id long, rank int, segment int, doc_id long{url}, score double"
    )


# ----------------------------------------------------------------- serving --


def search_local_federated(
    roots_or_indexes: list,
    queries: pd.DataFrame,
    ts_from=None,
    ts_to=None,
    kernel: str = "auto",
    with_url: bool = True,
    count_only: bool = False,
) -> pd.DataFrame:
    """Serving twin: Spark-free scatter-gather over LocalIndex handles.

    Global stats come the cheap interactive way — union N/avgdl from each
    segment's stats.json, union df for ONLY the query's resolved terms
    (each segment's term_info probe, summed) — i.e. the literal
    dfs_query_then_fetch two-phase: stats round-trip, then scoring. The
    per-segment scoring runs `search_local` with stats/df overrides, so
    every serving kernel path is reused unchanged.

    Returns (query_id, rank, segment, doc_id[, url], score) ranked by
    (score desc, url asc) — identical rows to the Spark path (pinned).
    """
    from invoicenet_spark.query.local import local_index, search_local

    lis = [local_index(r) for r in roots_or_indexes]
    for li in lis:
        if li.stats.get("fields"):
            raise NotImplementedError(
                "federated search over fielded indexes is not supported"
            )
    live = [
        i
        for i, li in enumerate(lis)
        if _overlaps(li.stats.get("ts_min"), li.stats.get("ts_max"), ts_from, ts_to)
    ]
    if not live:
        if count_only:
            return pd.DataFrame(
                {"query_id": queries["query_id"].astype("int64"),
                 "total_hits": np.zeros(len(queries), dtype="int64")}
            )
        cols = ["query_id", "rank", "segment", "doc_id"] + (
            ["url"] if with_url else []
        ) + ["score"]
        return pd.DataFrame(columns=cols)

    n_total = sum(lis[i].stats["N"] for i in live)
    avgdl = (
        sum(lis[i].stats["N"] * lis[i].stats["avgdl"] for i in live) / n_total
        if n_total
        else 0.0
    )
    # dfs phase: union df for the batch's terms. Expansion (PREFIX/FUZZY)
    # is per-segment inside search_local, so pre-resolving exact terms here
    # covers flat terms + neg_terms + BOOL leaf terms; expanded terms fall
    # back to segment-local df only if a segment expands a term the probe
    # didn't see — avoided by passing the expanded union back in df_override
    # being a default-dict-style lookup (missing term → segment-local df is
    # WRONG for union scoring, so search_local treats df_override as
    # total: missing → sum over segments captured below).
    needed: set[str] = set()
    for ts in queries["terms"]:
        for t in ts:
            needed.add(str(t).partition("^")[0])
    if "neg_terms" in queries.columns:
        for ts in queries["neg_terms"]:
            if isinstance(ts, (list, tuple, np.ndarray)):
                needed.update(map(str, ts))
    # include every dictionary term a PREFIX/FUZZY/BOOL row could expand to,
    # per segment, so the union-df map is complete before scoring
    expand_rows = queries["mode"].isin(["PREFIX", "FUZZY", "BOOL"]).any()
    per_seg_expansions: set[str] = set()
    if expand_rows:
        for i in live:
            li = lis[i]
            for _, q in queries.iterrows():
                if q["mode"] == "PREFIX":
                    per_seg_expansions.update(li.expand_prefixes(list(q["terms"])))
                elif q["mode"] == "FUZZY":
                    e = q.get("max_edits")
                    per_seg_expansions.update(
                        li.expand_fuzzy(
                            list(q["terms"]),
                            int(e) if e is not None and not pd.isna(e) else 1,
                        )
                    )
                elif q["mode"] == "BOOL":
                    from invoicenet_spark.query import booltree

                    raw = q.get("tree")
                    if raw is None or (isinstance(raw, float) and pd.isna(raw)):
                        raw = q["terms"][0]
                    tree = booltree.normalize_query(
                        raw, li.expand_prefixes, lambda ts_, e_: li.expand_fuzzy(ts_, e_)
                    )
                    per_seg_expansions.update(booltree.leaf_terms(tree))
    probe = sorted({t.partition("^")[0] for t in (needed | per_seg_expansions)})
    df_union: dict[str, int] = {}
    for i in live:
        for t, (_tid, df) in lis[i].term_info(set(probe)).items():
            df_union[t] = df_union.get(t, 0) + int(df)

    stats_override = {"N": n_total, "avgdl": avgdl}
    frames = []
    for i in live:
        res = search_local(
            lis[i], queries.copy(), kernel=kernel, with_url=with_url,
            count_only=count_only,
            stats_override=stats_override, df_override=df_union,
        )
        if not count_only:
            res = res.copy()
            res["segment"] = i
        frames.append(res)
    merged = pd.concat(frames, ignore_index=True)
    if count_only:
        out = merged.groupby("query_id", as_index=False)["total_hits"].sum()
        return out.astype({"query_id": "int64", "total_hits": "int64"})
    if not len(merged):
        cols = ["query_id", "rank", "segment", "doc_id"] + (
            ["url"] if with_url else []
        ) + ["score"]
        return pd.DataFrame(columns=cols)
    sort_keys = ["query_id", "score"] + (["url"] if with_url else ["segment", "doc_id"])
    merged = merged.sort_values(
        sort_keys, ascending=[True, False] + [True] * (len(sort_keys) - 2)
    )
    merged["rank"] = merged.groupby("query_id").cumcount() + 1
    kmap = dict(zip(queries["query_id"].astype(int), queries["k"].astype(int)))
    merged = merged[merged["rank"] <= merged["query_id"].map(kmap)]
    cols = ["query_id", "rank", "segment", "doc_id"] + (
        ["url"] if with_url else []
    ) + ["score"]
    return merged[cols].reset_index(drop=True)
