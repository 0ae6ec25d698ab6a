"""Round-6 optimization probes (guide §1: measure first).

Variants are implemented HERE first, timed with the frozen bench's own
methodology (.count(), warmup + median of reps) against the current
implementations, and equality-checked exactly (collected rows) before
anything is ported into the package. Usage:

    python tools/r06_probe.py dedup  [sf_dir]
    python tools/r06_probe.py build  [n_docs]
    python tools/r06_probe.py misc   [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from invoicenet_spark.functions.analyzer import tokens_col
from invoicenet_spark.ops.dedup import (
    _spread_small_input,
    jaccard_pairs,
    minhash_lsh_candidates,
    minhash_lsh_pairs,
    portable_hash64,
    shingles_df,
    simhash_signatures,
)
from invoicenet_spark.session import get_spark

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def measure(fn, warmups=1, reps=3):
    for _ in range(warmups):
        fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return round(ts[len(ts) // 2], 3), [round(t, 3) for t in ts]


def same_rows(a: DataFrame, b: DataFrame) -> bool:
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    return ra == rb


# --------------------------------------------------------------- variants --
def simhash_one_shuffle(df, text_col="text", key_col="doc_id", bits=60):
    """Single-shuffle simhash: votes aggregated per token INSTANCE (±1 per
    instance == ±tf per distinct term), skipping the (doc, term) pre-agg
    exchange entirely."""
    toks = (
        _spread_small_input(df)
        .select(key_col, F.explode(tokens_col(text_col)).alias("term"))
        .withColumn("h", portable_hash64(F.col("term")))
    )
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, F.lit(1)).otherwise(
                F.lit(-1)
            )
        ).alias(f"v{i}")
        for i in range(bits)
    ]
    agg = toks.groupBy(key_col).agg(*votes)
    sig = None
    for i in range(bits):
        bit = F.when(F.col(f"v{i}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, i)
        sig = term if sig is None else sig.bitwiseXOR(term)
    return agg.select(key_col, sig.alias("simhash"))


def minhash_signatures_dicthash(df, text_col="text", key_col="doc_id", n=3,
                                num_perm=16, shingles=None):
    """Hash each DISTINCT shingle once per permutation (16 md5 per vocab
    entry instead of per (doc, shingle) row), then join back and min-agg."""
    sh = shingles if shingles is not None else shingles_df(df, text_col, key_col, n)
    uniq = sh.select("shingle").distinct().select(
        "shingle",
        *[portable_hash64(F.col("shingle"), seed=i).alias(f"h{i}") for i in range(num_perm)],
    )
    wide = (
        sh.join(uniq, "shingle")
        .groupBy(key_col)
        .agg(*[F.min(f"h{i}").alias(f"h{i}") for i in range(num_perm)])
    )
    return wide.select(key_col, F.array(*[f"h{i}" for i in range(num_perm)]).alias("sig"))


def minhash_lsh_candidates_v2(df, text_col="text", key_col="doc_id", n=3,
                              num_perm=16, bands=4, shingles=None):
    rows = num_perm // bands
    sig = minhash_signatures_dicthash(df, text_col, key_col, n, num_perm, shingles=shingles)
    band_cols = [
        F.struct(
            F.lit(bi).alias("band"),
            F.concat_ws(
                "_", *[F.col("sig")[bi * rows + r].cast("string") for r in range(rows)]
            ).alias("bh"),
        )
        for bi in range(bands)
    ]
    banded = sig.select(key_col, F.explode(F.array(*band_cols)).alias("b")).select(
        key_col, F.col("b.band").alias("band"), F.col("b.bh").alias("bh")
    )
    a = banded.alias("x")
    b = banded.alias("y")
    return (
        a.join(b, ["band", "bh"])
        .where(F.col(f"x.{key_col}") < F.col(f"y.{key_col}"))
        .select(F.col(f"x.{key_col}").alias("id_a"), F.col(f"y.{key_col}").alias("id_b"))
        .distinct()
    )


def minhash_lsh_pairs_v2(df, text_col="text", key_col="doc_id", n=3,
                         num_perm=16, bands=4, threshold=0.5):
    cand = minhash_lsh_candidates_v2(df, text_col, key_col, n, num_perm, bands)
    return jaccard_pairs(df, text_col, key_col, n, threshold, candidates=cand)


def jaccard_pairs_v2(df, text_col="text", key_col="doc_id", n=3, threshold=0.5):
    """All-pairs Jaccard with ONE shingle computation: the self-join's two
    sides come from the SAME frame (canonical subtree → exchange reuse)."""
    sh = shingles_df(df, text_col, key_col, n)
    sizes = sh.groupBy(key_col).agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, F.col("a.shingle") == F.col("b.shingle"))
        .where(F.col(f"a.{key_col}") < F.col(f"b.{key_col}"))
        .groupBy(F.col(f"a.{key_col}").alias("id_a"), F.col(f"b.{key_col}").alias("id_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col(key_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(key_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            (F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))).cast("double"),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def jaccard_pairs_v3(df, text_col="text", key_col="doc_id", n=3, threshold=0.5):
    """All-pairs via groupBy(shingle) → sorted doc array → pair explode:
    one exchange of the (key, shingle) rows instead of a two-sided join."""
    sh = shingles_df(df, text_col, key_col, n)
    sizes = sh.groupBy(key_col).agg(F.count("*").alias("n_sh"))
    grouped = (
        sh.groupBy("shingle")
        .agg(F.sort_array(F.collect_list(key_col)).alias("ds"))
        .where(F.size("ds") >= 2)
    )
    pairs = grouped.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("ds"),
                    lambda a, i: F.transform(
                        F.slice(F.col("ds"), i + F.lit(2), F.size("ds") - i - F.lit(1)),
                        lambda b: F.struct(a.alias("id_a"), b.alias("id_b")),
                    ),
                )
            )
        ).alias("p")
    ).select("p.id_a", "p.id_b")
    inter = pairs.groupBy("id_a", "id_b").agg(F.count("*").alias("n_inter"))
    sa = sizes.select(F.col(key_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(key_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            (F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))).cast("double"),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def doc_freq_v2(spark, sf_dir):
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return (
        docs.select("doc_id", F.explode(F.array_distinct(tokens_col("text"))).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("df"))
    )


def ann_cosine_v2(spark, sf_dir):
    from invoicenet_spark.ops import similarity
    from pyspark.sql import Window

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    q = emb.where(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    scored = emb.where(F.col("vec_id") != 0).crossJoin(F.broadcast(q)).select(
        "vec_id",
        F.round(similarity.cosine_col(F.col("embedding"), F.col("qv")), 6).alias("cos_r6"),
    )
    top = scored.orderBy(F.col("cos_r6").desc(), F.col("vec_id").asc()).limit(10)
    w = Window.orderBy(F.col("cos_r6").desc(), F.col("vec_id").asc())
    return top.withColumn("rank", F.row_number().over(w).cast("long")).select(
        "rank", "vec_id", "cos_r6"
    )


# ----------------------------------------------------------------- drivers --
def run_dedup(sf_dir: str):
    spark = get_spark("r06_probe", cores=CPUS, shuffle_partitions=CPUS)
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    sc = spark.sparkContext
    res = {}

    cases = [
        ("simhash_cur", lambda: simhash_signatures(docs).count()),
        ("simhash_v2", lambda: simhash_one_shuffle(docs).count()),
        ("minhash_cur", lambda: minhash_lsh_pairs(docs, threshold=0.12).count()),
        ("minhash_v2", lambda: minhash_lsh_pairs_v2(docs, threshold=0.12).count()),
        ("jaccard_cur", lambda: jaccard_pairs(docs, threshold=0.12).count()),
        ("jaccard_v2", lambda: jaccard_pairs_v2(docs, threshold=0.12).count()),
        ("jaccard_v3", lambda: jaccard_pairs_v3(docs, threshold=0.12).count()),
    ]
    for name, fn in cases:
        sc.setJobDescription(name)
        med, ts = measure(fn)
        res[name] = (med, ts)
        print(name, med, ts, flush=True)

    # exact-equality gates
    print("eq simhash:", same_rows(simhash_signatures(docs), simhash_one_shuffle(docs)), flush=True)
    print("eq minhash:", same_rows(minhash_lsh_pairs(docs, threshold=0.12),
                                   minhash_lsh_pairs_v2(docs, threshold=0.12)), flush=True)
    cur = jaccard_pairs(docs, threshold=0.12)
    print("eq jaccard_v2:", same_rows(cur, jaccard_pairs_v2(docs, threshold=0.12)), flush=True)
    print("eq jaccard_v3:", same_rows(cur, jaccard_pairs_v3(docs, threshold=0.12)), flush=True)
    return res


def run_misc(sf_dir: str):
    from invoicenet_spark import entrypoints

    spark = get_spark("r06_probe", cores=CPUS, shuffle_partitions=CPUS)
    sc = spark.sparkContext
    cases = [
        ("doc_freq_cur", lambda: entrypoints.QUERIES["doc_freq"](spark, sf_dir).count()),
        ("doc_freq_v2", lambda: doc_freq_v2(spark, sf_dir).count()),
        ("ann_cur", lambda: entrypoints.QUERIES["ann_cosine_topk"](spark, sf_dir).count()),
        ("ann_v2", lambda: ann_cosine_v2(spark, sf_dir).count()),
        ("tpch_q1", lambda: entrypoints.QUERIES["tpch_q1"](spark, sf_dir).count()),
        ("events_window", lambda: entrypoints.QUERIES["events_window"](spark, sf_dir).count()),
        ("term_counts", lambda: entrypoints.QUERIES["term_counts"](spark, sf_dir).count()),
    ]
    for name, fn in cases:
        sc.setJobDescription(name)
        med, ts = measure(fn)
        print(name, med, ts, flush=True)
    print("eq doc_freq:", same_rows(entrypoints.QUERIES["doc_freq"](spark, sf_dir),
                                    doc_freq_v2(spark, sf_dir)), flush=True)
    print("eq ann:", same_rows(entrypoints.QUERIES["ann_cosine_topk"](spark, sf_dir),
                               ann_cosine_v2(spark, sf_dir)), flush=True)


def run_build(n_docs: int):
    """Decompose phase 2 of the index build with noop sinks."""
    import tempfile

    from invoicenet_spark.config import EngineConfig
    from invoicenet_spark.fixtures import gen_pages_spark
    from invoicenet_spark.index.build import build_index

    spark = get_spark("r06_probe_build", cores=CPUS, shuffle_partitions=CPUS,
                      driver_memory="48g")
    sc = spark.sparkContext
    cfg = EngineConfig(shard_size=1 << 14, block_size=128, build_partitions=CPUS)
    pages_path = os.path.join(tempfile.gettempdir(), "probe_pages")
    gen_pages_spark(spark, n_docs, seed=42, partitions=CPUS).write.mode(
        "overwrite"
    ).parquet(pages_path)
    pages = spark.read.parquet(pages_path)

    def _noop(df):
        df.write.format("noop").mode("overwrite").save()

    from invoicenet_spark.functions.extract import extract_pages_arrow
    from invoicenet_spark.functions.analyzer import analyze_col

    gated = pages.where(F.col("lang").isin(*cfg.index_langs))
    pages_text = extract_pages_arrow(
        gated.select("url", "warc_ts", "html"), keep=("url", "warc_ts"),
        strategy=cfg.extract_strategy,
    )

    steps = [
        ("scan_pages", lambda: _noop(pages)),
        ("extract", lambda: _noop(pages_text)),
        ("extract_tokenize_doclen", lambda: _noop(
            pages_text.select("url", F.size(analyze_col("text")).alias("doc_len"))
        )),
        ("extract_explode", lambda: _noop(
            pages_text.select(F.explode(analyze_col("text")).alias("term"), "url")
        )),
        ("explode_groupby_pairs", lambda: _noop(
            pages_text.select(F.explode(analyze_col("text")).alias("term"), "url")
            .groupBy("term", "url").agg(F.count("*").alias("tf"))
        )),
    ]
    for name, fn in steps:
        sc.setJobDescription(name)
        med, ts = measure(fn, warmups=1, reps=3)
        print(name, med, ts, flush=True)

    # whole builds for reference
    import shutil

    def one_build():
        out = os.path.join(tempfile.mkdtemp(prefix="probe_idx_"), "index")
        t0 = time.perf_counter()
        build_index(spark, pages, out, cfg)
        dt = time.perf_counter() - t0
        import json

        with open(os.path.join(out, "manifest.json")) as f:
            m = json.load(f)
        shutil.rmtree(os.path.dirname(out), ignore_errors=True)
        return dt, m.get("phase1_sec"), m.get("phase2_sec")

    for i in range(3):
        sc.setJobDescription(f"full_build_{i}")
        print("full_build", one_build(), flush=True)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "dedup"
    arg = sys.argv[2] if len(sys.argv) > 2 else None
    if mode == "dedup":
        run_dedup(arg or "/root/testdata/sf0.1")
    elif mode == "misc":
        run_misc(arg or "/root/testdata/sf0.1")
    elif mode == "build":
        run_build(int(arg or "100000"))
