"""Distributed inverted-index construction (the `prepare_data.py` path).

Reference lifecycle (SURVEY.md §3.1): glob scan → per-doc rasterize/OCR →
n-gram candidates → hashed dictionaries → sparse candidate store → JSON sink,
parallelized by a process pool (prepare_data.py:113-120). The engine re-plans
it Spark-first:

  pages ──filter(lang)──> extract_text (Arrow UDF, narrow)
        ──tokenize (JVM codegen)──> token rows (term, doc_id, shard, doc_len)
        ──ONE shuffle: repartition(term, shard) + sortWithinPartitions──>
        ──mapInPandas vectorized encoder──> postings rows
        ──write parquet partitioned by shard (per-shard commit = lineage)
  terms dictionary + corpus stats aggregated FROM the committed postings
  (df = Σ df_shard), so the build is a single pass over the token stream.

Skew (north_rule): posting lists are sharded by docID range
(shard = doc_id // shard_size), so a Zipfian head term's postings are spread
over all shards — structurally equivalent to salting the hot key, but the
"salt" is the docID range itself, which keeps each (term, shard) run sorted
and makes the final index the concatenation of shard outputs: the two-phase
salted merge collapses into phase one. No (term, shard) group can exceed
shard_size docs, so no straggler task exists by construction; AQE skew-join
handling stays on as a backstop.

Resumability (north_rule): phase 1 commits the doc dictionary; phase 2
commits postings shard-by-shard with a manifest row per shard (status,
n_terms, n_postings, bytes, wall seconds); phase 3 derives terms + stats
from committed shards. `build_index(..., resume=True)` skips committed
shards and re-tokenizes only the pages belonging to missing ones —
per-partition lineage like the reference's best-checkpoint restore
(invoicenet/common/trainer.py:68-71, acp/acp.py:66-72).
"""

from __future__ import annotations

import json
import os
import shutil
import time
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from invoicenet_spark.config import EngineConfig
from invoicenet_spark.functions.analyzer import tokens_col
from invoicenet_spark.functions.extract import extract_text_udf
from invoicenet_spark.functions.ids import assign_dense_ids
from invoicenet_spark.index.codec import vb_encode


@dataclass
class IndexPaths:
    root: str

    @property
    def docs(self) -> str:
        return os.path.join(self.root, "docs")

    @property
    def postings(self) -> str:
        return os.path.join(self.root, "postings")

    @property
    def terms(self) -> str:
        return os.path.join(self.root, "terms")

    @property
    def stats(self) -> str:
        return os.path.join(self.root, "stats.json")

    @property
    def manifest(self) -> str:
        return os.path.join(self.root, "manifest.json")


POSTINGS_SCHEMA = (
    "term string, shard long, df_shard long, doc_blob binary, tf_blob binary, "
    "block_last array<long>, block_doc_off array<int>, block_tf_off array<int>, "
    "block_max_tf array<long>, block_min_dl array<long>"
)


# ------------------------------------------------------------ encode kernel --
def _byte_lens(v: np.ndarray) -> np.ndarray:
    """varbyte byte-length per value (vectorized over byte positions)."""
    nb = np.ones(v.size, dtype=np.int64)
    rest = v >> np.uint64(7)
    while rest.any():
        nb += (rest > 0).astype(np.int64)
        rest >>= np.uint64(7)
    return nb


def _encode_groups(pdf: pd.DataFrame, block_size: int) -> pd.DataFrame:
    """Encode a frame of token rows (sorted by term, shard, doc_id) into one
    posting row per (term, shard). Fully vectorized: tf via run-length over
    (term, shard, doc_id); varbyte over the whole frame in one call; per-group
    slicing from precomputed byte offsets.
    """
    terms = pdf["term"].to_numpy()
    shards = pdf["shard"].to_numpy()
    doc_ids = pdf["doc_id"].to_numpy()
    doc_lens = pdf["doc_len"].to_numpy()
    n = len(pdf)
    if n == 0:
        return _empty_postings_pdf()

    # --- run-length: one row per (term, shard, doc_id) with tf = run size
    new_posting = np.ones(n, dtype=bool)
    new_posting[1:] = (
        (terms[1:] != terms[:-1]) | (shards[1:] != shards[:-1]) | (doc_ids[1:] != doc_ids[:-1])
    )
    p_start = np.flatnonzero(new_posting)
    tf = np.diff(np.append(p_start, n))
    terms_p = terms[p_start]
    shards_p = shards[p_start]
    docs_p = doc_ids[p_start].astype(np.int64)
    dl_p = doc_lens[p_start].astype(np.int64)
    m = p_start.size

    # --- group boundaries: one posting row per (term, shard)
    new_group = np.ones(m, dtype=bool)
    new_group[1:] = (terms_p[1:] != terms_p[:-1]) | (shards_p[1:] != shards_p[:-1])
    g_start = np.flatnonzero(new_group)
    g_end = np.append(g_start[1:], m)
    g_sizes = g_end - g_start

    # --- docID deltas (reset to absolute at group start)
    deltas = np.diff(docs_p, prepend=np.int64(0))
    deltas[g_start] = docs_p[g_start]
    deltas_u = deltas.astype(np.uint64)
    tf_u = tf.astype(np.uint64)

    # --- one varbyte call per stream, then slice per group
    doc_blob_all = np.frombuffer(vb_encode(deltas_u), dtype=np.uint8)
    tf_blob_all = np.frombuffer(vb_encode(tf_u), dtype=np.uint8)
    doc_ends = np.cumsum(_byte_lens(deltas_u))
    tf_ends = np.cumsum(_byte_lens(tf_u))
    doc_starts_b = doc_ends - _byte_lens(deltas_u)
    tf_starts_b = tf_ends - _byte_lens(tf_u)

    # --- block structure: ordinal within group, block = ordinal // block_size
    ordinal = np.arange(m, dtype=np.int64) - np.repeat(g_start, g_sizes)
    is_block_start = (ordinal % block_size) == 0
    b_start = np.flatnonzero(is_block_start)
    b_end = np.append(b_start[1:], m)
    # block group index = searchsorted of block start into group starts
    b_group = np.searchsorted(g_start, b_start, side="right") - 1
    block_last_all = docs_p[b_end - 1]
    block_max_tf_all = np.maximum.reduceat(tf, b_start)
    block_min_dl_all = np.minimum.reduceat(dl_p, b_start)
    # per-group block counts → split points for the block arrays
    blocks_per_group = np.bincount(b_group, minlength=g_start.size)
    block_split = np.cumsum(blocks_per_group)[:-1]

    # byte offsets of blocks, relative to their group's blob start
    block_doc_off_all = (doc_starts_b[b_start] - doc_starts_b[g_start][b_group]).astype(np.int32)
    block_tf_off_all = (tf_starts_b[b_start] - tf_starts_b[g_start][b_group]).astype(np.int32)

    bl_split = np.split(block_last_all, block_split)
    bmt_split = np.split(block_max_tf_all, block_split)
    bmd_split = np.split(block_min_dl_all, block_split)
    bdo_split = np.split(block_doc_off_all, block_split)
    bto_split = np.split(block_tf_off_all, block_split)

    doc_blob_b = doc_blob_all.tobytes()
    tf_blob_b = tf_blob_all.tobytes()
    g_doc_lo = doc_starts_b[g_start]
    g_doc_hi = np.append(doc_starts_b[g_start][1:], doc_ends[-1])
    g_tf_lo = tf_starts_b[g_start]
    g_tf_hi = np.append(tf_starts_b[g_start][1:], tf_ends[-1])

    return pd.DataFrame(
        {
            "term": terms_p[g_start],
            "shard": shards_p[g_start].astype(np.int64),
            "df_shard": g_sizes.astype(np.int64),
            "doc_blob": [doc_blob_b[lo:hi] for lo, hi in zip(g_doc_lo, g_doc_hi)],
            "tf_blob": [tf_blob_b[lo:hi] for lo, hi in zip(g_tf_lo, g_tf_hi)],
            "block_last": [a.tolist() for a in bl_split],
            "block_doc_off": [a.tolist() for a in bdo_split],
            "block_tf_off": [a.tolist() for a in bto_split],
            "block_max_tf": [a.tolist() for a in bmt_split],
            "block_min_dl": [a.tolist() for a in bmd_split],
        }
    )


def _empty_postings_pdf() -> pd.DataFrame:
    return pd.DataFrame(
        {
            "term": pd.Series([], dtype=object),
            "shard": pd.Series([], dtype=np.int64),
            "df_shard": pd.Series([], dtype=np.int64),
            "doc_blob": pd.Series([], dtype=object),
            "tf_blob": pd.Series([], dtype=object),
            "block_last": pd.Series([], dtype=object),
            "block_doc_off": pd.Series([], dtype=object),
            "block_tf_off": pd.Series([], dtype=object),
            "block_max_tf": pd.Series([], dtype=object),
            "block_min_dl": pd.Series([], dtype=object),
        }
    )


def _encode_partition(batches, block_size: int):
    """mapInPandas kernel: stream Arrow batches of sorted token rows, carry
    the trailing incomplete (term, shard) group across batch boundaries so
    groups are never split (SURVEY.md §4: custom piece #1/#3)."""
    pending: pd.DataFrame | None = None
    for pdf in batches:
        if pending is not None and len(pending):
            pdf = pd.concat([pending, pdf], ignore_index=True)
        if len(pdf) == 0:
            continue
        terms = pdf["term"].to_numpy()
        shards = pdf["shard"].to_numpy()
        last_t, last_s = terms[-1], shards[-1]
        tail_mask = (terms == last_t) & (shards == last_s)
        # tail is contiguous (sorted input): first index of the last group
        cut = int(len(pdf) - tail_mask[::-1].argmin()) if not tail_mask.all() else 0
        if cut == 0:
            pending = pdf  # whole batch is one group; keep accumulating
            continue
        pending = pdf.iloc[cut:].reset_index(drop=True)
        yield _encode_groups(pdf.iloc[:cut], block_size)
    if pending is not None and len(pending):
        yield _encode_groups(pending, block_size)


# ------------------------------------------------------------------- build --
def tokens_from_pages(pages: DataFrame, cfg: EngineConfig, use_stored_text: bool = False):
    """pages → (url, text) after the language gate + extraction UDF."""
    gated = pages.where(F.col("lang").isin(*cfg.index_langs))
    if use_stored_text:
        return gated.select("url", "text")
    return gated.select("url", extract_text_udf(F.col("html")).alias("text"))


def build_doc_table(pages_text: DataFrame, cfg: EngineConfig, id_offset: int = 0) -> DataFrame:
    """(doc_id, url, doc_len, shard): dense docIDs by url rank (ids.py).

    id_offset: first docID to assign — incremental builds pass the next
    shard-aligned boundary so new docs land in fresh shards and committed
    posting shards are never rewritten (append-only segments).
    """
    with_len = pages_text.select(
        "url", F.size(tokens_col("text", cfg.token_pattern)).alias("doc_len")
    )
    docs = assign_dense_ids(with_len, key="url", id_col="doc_id", num_partitions=cfg.build_partitions)
    if id_offset:
        docs = docs.withColumn("doc_id", F.col("doc_id") + F.lit(id_offset))
    return docs.withColumn("shard", (F.col("doc_id") / F.lit(cfg.shard_size)).cast("long"))


def build_index(
    spark: SparkSession,
    pages: DataFrame,
    out_dir: str,
    cfg: EngineConfig | None = None,
    resume: bool = False,
    fail_after_shards: int | None = None,
    use_stored_text: bool = False,
) -> IndexPaths:
    """Full index build. See module docstring for the plan shape.

    fail_after_shards: test hook — commit only the first k shards then raise,
    to exercise resume (FIXTURES.md invariant 6).
    """
    cfg = cfg or EngineConfig()
    paths = IndexPaths(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    if resume:
        manifest = _load_manifest(paths)
        cfg = cfg_from_manifest(manifest, cfg)  # persisted layout wins
    else:
        manifest = {"shards": {}, "config": _cfg_dict(cfg)}

    pages_text = tokens_from_pages(pages, cfg, use_stored_text=use_stored_text)

    # ---- phase 1: doc dictionary (committed once; reused on resume)
    if resume and os.path.exists(paths.docs):
        docs = spark.read.parquet(paths.docs)
    else:
        t0 = time.time()
        build_doc_table(pages_text, cfg).write.mode("overwrite").parquet(paths.docs)
        docs = spark.read.parquet(paths.docs)
        manifest["phase1_sec"] = round(time.time() - t0, 3)

    all_shards = [r["shard"] for r in docs.select("shard").distinct().collect()]
    done = {int(s) for s, v in manifest["shards"].items() if v.get("status") == "committed"}
    pending = sorted(set(int(s) for s in all_shards) - done)

    # ---- phase 2: postings, committed per shard (lineage granularity)
    t0 = time.time()
    n_new_docs = 0
    if pending:
        docs_pending = docs.where(F.col("shard").isin([int(s) for s in pending]))
        n_new_docs = _encode_and_commit(
            spark, pages_text, docs_pending, pending, cfg, paths, manifest, fail_after_shards
        )

    # ---- phase 3: terms dictionary + corpus stats + metrics
    _finalize(spark, docs, cfg, paths, manifest, t0, n_new_docs)
    return paths


def _encode_and_commit(
    spark,
    pages_text: DataFrame,
    docs_pending: DataFrame,
    pending: list[int],
    cfg: EngineConfig,
    paths: IndexPaths,
    manifest: dict,
    fail_after_shards: int | None = None,
) -> int:
    """Token shuffle + vectorized encode + per-shard directory commit.
    Returns the number of docs indexed."""
    n_new_docs = docs_pending.count()
    # join brings (doc_id, shard, doc_len) onto the page text; on a fresh
    # build this is the only wide op before the token shuffle
    src = pages_text.join(docs_pending, "url")
    tokens = src.select(
        F.explode(tokens_col("text", cfg.token_pattern)).alias("term"),
        "doc_id",
        "shard",
        "doc_len",
    )
    encoded = (
        tokens.repartition(cfg.build_partitions, "term", "shard")
        .sortWithinPartitions("term", "shard", "doc_id")
        .mapInPandas(lambda it: _encode_partition(it, cfg.block_size), schema=POSTINGS_SCHEMA)
    )
    # one file tree per shard → a shard directory is the commit unit
    staged = encoded.repartition(F.col("shard")).sortWithinPartitions("term")
    staging = os.path.join(paths.root, "_staging_postings")
    staged.write.mode("overwrite").partitionBy("shard").parquet(staging)

    committed = 0
    os.makedirs(paths.postings, exist_ok=True)
    for shard in pending:
        src_dir = os.path.join(staging, f"shard={shard}")
        dst_dir = os.path.join(paths.postings, f"shard={shard}")
        if not os.path.exists(src_dir):
            continue
        if fail_after_shards is not None and committed >= fail_after_shards:
            _save_manifest(paths, manifest)
            raise RuntimeError(f"injected failure after {committed} shards (test hook)")
        if os.path.exists(dst_dir):
            shutil.rmtree(dst_dir)
        shutil.move(src_dir, dst_dir)
        manifest["shards"][str(shard)] = {"status": "committed"}
        committed += 1
        _save_manifest(paths, manifest)
    shutil.rmtree(staging, ignore_errors=True)
    return int(n_new_docs)


def _finalize(
    spark,
    docs: DataFrame,
    cfg: EngineConfig,
    paths: IndexPaths,
    manifest: dict,
    t0: float,
    n_new_docs: int,
) -> None:
    """Terms dictionary + corpus stats from committed postings, plus the
    north_rule build metrics (docs/sec, postings/partition, merge fan-in)."""
    postings = spark.read.parquet(paths.postings)
    term_df = postings.groupBy("term").agg(F.sum("df_shard").alias("df"))
    terms = assign_dense_ids(
        term_df, key="term", id_col="term_id", num_partitions=cfg.build_partitions
    )
    terms.write.mode("overwrite").parquet(paths.terms)

    stats_row = docs.agg(F.count("*").alias("N"), F.avg("doc_len").alias("avgdl")).collect()[0]
    stats = {
        "N": int(stats_row["N"]),
        "avgdl": float(stats_row["avgdl"]),
        "k1": cfg.k1,
        "b": cfg.b,
        "shard_size": cfg.shard_size,
        "block_size": cfg.block_size,
    }
    with open(paths.stats, "w") as f:
        json.dump(stats, f)

    build_sec = round(time.time() - t0, 3)
    shard_metrics = {
        str(r["shard"]): {
            "status": "committed",
            "n_terms": int(r["n_terms"]),
            "n_postings": int(r["n_postings"]),
            "bytes": int(r["bytes"]),
        }
        for r in postings.groupBy("shard")
        .agg(
            F.count("*").alias("n_terms"),
            F.sum("df_shard").alias("n_postings"),
            F.sum(F.length("doc_blob") + F.length("tf_blob")).alias("bytes"),
        )
        .collect()
    }
    manifest["shards"].update(shard_metrics)
    manifest["phase2_sec"] = build_sec
    manifest["docs_indexed_this_run"] = int(n_new_docs)
    manifest["docs_per_sec_this_run"] = round(n_new_docs / build_sec, 2) if build_sec else None
    manifest["merge_fan_in"] = cfg.build_partitions
    manifest["stats"] = stats
    _save_manifest(paths, manifest)


def _cfg_dict(cfg: EngineConfig) -> dict:
    return {
        "k1": cfg.k1,
        "b": cfg.b,
        "shard_size": cfg.shard_size,
        "block_size": cfg.block_size,
        "token_pattern": cfg.token_pattern,
        "index_langs": list(cfg.index_langs),
    }


def _load_manifest(paths: IndexPaths) -> dict:
    if os.path.exists(paths.manifest):
        with open(paths.manifest) as f:
            return json.load(f)
    return {"shards": {}}


def cfg_from_manifest(manifest: dict, fallback: EngineConfig) -> EngineConfig:
    """Index-layout parameters are immutable once built: resume/update must
    use the persisted config, not the caller's — otherwise a later run with
    a different shard_size computes shard numbers that collide with
    committed shard directories."""
    c = manifest.get("config")
    if not c:
        return fallback
    return EngineConfig(
        k1=c.get("k1", fallback.k1),
        b=c.get("b", fallback.b),
        shard_size=c.get("shard_size", fallback.shard_size),
        block_size=c.get("block_size", fallback.block_size),
        token_pattern=c.get("token_pattern", fallback.token_pattern),
        index_langs=tuple(c.get("index_langs", fallback.index_langs)),
        build_partitions=fallback.build_partitions,  # runtime knob, not layout
    )


def _save_manifest(paths: IndexPaths, manifest: dict) -> None:
    tmp = paths.manifest + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, paths.manifest)
