"""Driver-local serving path: single-query latency without a Spark job.

Spark executes the BATCH query path (exec.search) — hundreds of queries per
job amortize the ~1.2 s job-scheduling floor. An interactive single query
doesn't: its kernel time is single-digit ms while the job costs 1.2 s. This
module is the serving-node fast path a search frontend would run: it reads
the SAME index files (hive-partitioned parquet postings + terms + docs)
through pyarrow.dataset with the SAME pushed term_id filter (row-group
min/max skipping on the term_id-sorted files), and scores with the SAME
numpy kernels (query/kernels.py) — so results are rank-identical to
exec.search by construction, and a test pins it.

At web scale this is the component that runs on each query-serving replica:
the dictionary is held hot (Index.local_dict), postings reads touch only
the probed term_ids' row groups, and nothing here involves the driver of a
build cluster — it is a client of the index files.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.dataset as ds

from invoicenet_spark.index import bm25
from invoicenet_spark.query import kernels
from invoicenet_spark.query.exec import Index


_DS_CACHE: dict[tuple[int, str], "ds.Dataset"] = {}
_CATALOG_CACHE: dict[int, "_PostingsCatalog"] = {}


def _dataset(index: Index, path: str) -> "ds.Dataset":
    """Arrow dataset per (index, path), cached."""
    key = (id(index), path)
    d = _DS_CACHE.get(key)
    if d is None:
        d = _DS_CACHE[key] = ds.dataset(path, format="parquet", partitioning="hive")
    return d


class _PostingsCatalog:
    """File-level (term_id min, max, shard) catalog over the postings files.

    A generic dataset scan re-reads every fragment's parquet footer PER
    QUERY to evaluate stats pruning (~0.4 ms × n_files — measured 0.6 s on
    a 1542-file index, dwarfing the kernel). The catalog reads every footer
    ONCE at open and thereafter a query touches only the files whose term
    range covers its terms — the serving-side analog of Iceberg's manifest
    min/max pruning, possible because the build range-partitions postings
    by (term_id, shard) so each file covers a narrow term slice.
    """

    def __init__(self, path: str):
        import re

        import pyarrow.parquet as pq

        d = ds.dataset(path, format="parquet", partitioning="hive")
        # (path, shard, [(rg_idx, lo, hi), ...]) — row-group granularity
        self.files: list[tuple[str, int, list[tuple[int, int, int]]]] = []
        self._handles: dict[str, "pq.ParquetFile"] = {}
        for frag in d.get_fragments():
            md = pq.ParquetFile(frag.path).metadata
            if md.num_rows == 0:
                continue
            rgs = []
            for i in range(md.num_row_groups):
                st = md.row_group(i).column(0).statistics  # col 0 = term_id
                rgs.append((i, int(st.min), int(st.max)))
            m = re.search(r"shard=(\d+)", frag.path)
            self.files.append((frag.path, int(m.group(1)), rgs))

    def _handle(self, path: str):
        import pyarrow.parquet as pq

        h = self._handles.get(path)
        if h is None:
            h = self._handles[path] = pq.ParquetFile(path)
        return h

    def read(self, term_ids: list[int], with_positions: bool = False) -> pd.DataFrame:
        from concurrent.futures import ThreadPoolExecutor

        import pyarrow as pa
        import pyarrow.compute as pc

        tids = sorted(term_ids)
        tid_arr = pa.array(tids, type=pa.int64())
        work = []
        for path, shard, rgs in self.files:
            hit_rgs = [i for i, lo, hi in rgs if any(lo <= t <= hi for t in tids)]
            if hit_rgs:
                work.append((path, shard, hit_rgs))
        columns = None
        if not with_positions and self.files:
            # column pruning: the position stream is by far the fattest
            # column (hot terms carry MBs of positions) and only PHRASE
            # queries decode it
            schema_names = self._handle(self.files[0][0]).schema_arrow.names
            columns = [c for c in schema_names if c not in ("pos_blob", "block_pos_off")]

        def fetch(item):
            path, shard, hit_rgs = item
            # Arrow-level row filter BEFORE pandas conversion: materializing
            # non-matching rows' nested blobs into python objects was the
            # hot spot, not the I/O
            t = self._handle(path).read_row_groups(hit_rgs, columns=columns)
            t = t.filter(pc.is_in(t.column("term_id"), value_set=tid_arr))
            return shard, t

        # parquet decode releases the GIL — thread the per-file reads
        with ThreadPoolExecutor(max_workers=8) as ex:
            fetched = [(s, t) for s, t in ex.map(fetch, work) if t.num_rows]
        if not fetched:
            return pd.DataFrame(columns=["term_id", "shard"])
        # ONE pandas conversion for the whole result (per-file to_pandas was
        # 1.4 ms of fixed overhead each)
        big = pa.concat_tables([t for _, t in fetched])
        pdf = big.to_pandas()
        pdf["shard"] = np.repeat(
            np.array([s for s, _ in fetched], dtype=np.int64),
            [t.num_rows for _, t in fetched],
        )
        return pdf


def _postings_rows(index: Index, term_ids: list[int], with_positions: bool = False) -> pd.DataFrame:
    cat = _CATALOG_CACHE.get(id(index))
    if cat is None:
        cat = _CATALOG_CACHE[id(index)] = _PostingsCatalog(index.paths.postings)
    return cat.read(term_ids, with_positions=with_positions)


def _urls_for(index: Index, doc_ids: list[int]) -> dict[int, str]:
    dataset = _dataset(index, index.paths.docs)
    tbl = dataset.to_table(
        columns=["doc_id", "url"], filter=ds.field("doc_id").isin(doc_ids)
    )
    return dict(zip(tbl.column("doc_id").to_pylist(), tbl.column("url").to_pylist()))


def search_local(
    index: Index,
    queries: pd.DataFrame,
    kernel: str = "auto",
    with_url: bool = True,
) -> pd.DataFrame:
    """Serve (query_id, terms, mode, k) queries driver-locally.

    Semantics mirror exec.search exactly: AND/OR dedupe terms, PHRASE keeps
    slots; AND/PHRASE require every term present in a shard; per-shard
    kernels produce local top-k; the global merge ranks by
    (score desc, doc_id asc). Returns the same columns as exec.search.
    """
    stats = index.stats
    if (queries["mode"] == "PHRASE").any() and not stats.get("with_positions", False):
        raise ValueError(
            "PHRASE queries require a positional index "
            "(build with EngineConfig(with_positions=True) / --with-positions)"
        )
    k1, b, avgdl, N = stats["k1"], stats["b"], stats["avgdl"], stats["N"]

    local = index.local_dict()
    needed_terms = {t for ts in queries["terms"] for t in ts}
    if local is not None:
        hit = local.loc[sorted(needed_terms & set(local.index))]
        term_info = {t: (int(r["term_id"]), int(r["df"])) for t, r in hit.iterrows()}
    else:
        tds = ds.dataset(index.paths.terms, format="parquet")
        tbl = tds.to_table(filter=ds.field("term").isin(sorted(needed_terms)))
        term_info = {
            t: (int(i), int(d))
            for t, i, d in zip(
                tbl.column("term").to_pylist(),
                tbl.column("term_id").to_pylist(),
                tbl.column("df").to_pylist(),
            )
        }

    all_tids = sorted({tid for tid, _ in term_info.values()})
    needs_positions = bool((queries["mode"] == "PHRASE").any())
    rows = (
        _postings_rows(index, all_tids, with_positions=needs_positions)
        if all_tids
        else pd.DataFrame()
    )
    by_tid_shard: dict[tuple[int, int], dict] = {}
    for rec in rows.to_dict("records") if len(rows) else []:
        by_tid_shard[(int(rec["term_id"]), int(rec["shard"]))] = rec
    shards_by_tid: dict[int, list[int]] = {}
    for tid, shard in by_tid_shard:
        shards_by_tid.setdefault(tid, []).append(shard)

    out_rows = []
    for _, q in queries.iterrows():
        qid, mode, k = int(q["query_id"]), q["mode"], int(q["k"])
        terms = list(q["terms"]) if mode == "PHRASE" else list(dict.fromkeys(q["terms"]))
        infos = [term_info.get(t) for t in terms]
        if any(i is None for i in infos) and mode in ("AND", "PHRASE"):
            continue
        infos_present = [(slot, i) for slot, i in enumerate(infos) if i is not None]
        if not infos_present:
            continue
        # candidate shards: union (OR) / intersection (AND, PHRASE)
        shard_sets = [set(shards_by_tid.get(tid, ())) for _, (tid, _) in infos_present]
        if mode in ("AND", "PHRASE"):
            cand_shards = set.intersection(*shard_sets) if shard_sets else set()
        else:
            cand_shards = set.union(*shard_sets) if shard_sets else set()

        docs_all, scores_all = [], []
        for shard in sorted(cand_shards):
            plists = []
            ok = True
            pairs = infos_present if mode != "PHRASE" else list(enumerate(infos))
            for slot, info in pairs:
                tid, df = info
                rec = by_tid_shard.get((tid, shard))
                if rec is None:
                    if mode in ("AND", "PHRASE"):
                        ok = False  # every term must be present in the shard
                        break
                    continue  # OR: just skip the absent term
                idf = bm25.idf(N, df)
                plists.append(
                    kernels.TermPostings(rec, idf=idf, avgdl=avgdl, k1=k1, b=b)
                )
            if not ok or not plists:
                continue
            if mode == "PHRASE":
                d, s = kernels.score_phrase(plists, k)
            elif mode == "AND":
                plists.sort(key=lambda tp: int(tp.row["term_id"]))
                d, s = kernels.score_exhaustive(plists, k, "AND")
            else:
                plists.sort(key=lambda tp: int(tp.row["term_id"]))
                if kernel == "exhaustive":
                    d, s = kernels.score_exhaustive(plists, k, "OR")
                elif kernel == "wand":
                    d, s = kernels.score_wand(plists, k)
                else:
                    d, s = kernels.score_blockmax(plists, k)
            docs_all.append(d)
            scores_all.append(s)
        if not docs_all:
            continue
        docs_cat = np.concatenate(docs_all)
        scores_cat = np.concatenate(scores_all)
        top_d, top_s = kernels.topk_select(docs_cat, scores_cat, k)
        for rank, (d, s) in enumerate(zip(top_d, top_s), start=1):
            out_rows.append((qid, rank, int(d), float(s)))

    out = pd.DataFrame(out_rows, columns=["query_id", "rank", "doc_id", "score"])
    if with_url and len(out):
        urls = _urls_for(index, sorted(set(out["doc_id"])))
        out["url"] = out["doc_id"].map(urls)
        out = out[["query_id", "rank", "doc_id", "url", "score"]]
    elif with_url:
        out["url"] = pd.Series(dtype="object")
        out = out[["query_id", "rank", "doc_id", "url", "score"]]
    return out.sort_values(["query_id", "rank"]).reset_index(drop=True)
