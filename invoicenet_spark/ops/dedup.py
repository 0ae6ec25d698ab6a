"""Deduplication operators for training-data pipelines.

Exact dedup (hash-groupBy), n-gram Jaccard, MinHash+LSH, SimHash, and
embedding-cosine near-dup. Scale notes per operator:

- exact: one shuffle on the fingerprint; at 100 TB this is the cheapest
  full-corpus op there is (map-side partial agg on a 32-byte key).
- ngram-jaccard: exact pairwise similarity via the shared-shingle inverted
  join — cost bounded by Σ df(shingle)²; use only after LSH candidate
  generation at scale (the `candidates` arg), standalone at small scale.
- minhash-lsh: shingle → k minhashes (one groupBy with k min() aggs, all
  JVM-side xxhash64) → band-bucket join → verified Jaccard. The classic
  near-dup path that scales: candidate pairs ∝ true dups, not n².
- simhash: 64-bit sign-of-weighted-bits signature per doc; near-dups =
  signatures at small Hamming distance, found via band-exact match.
- embedding cosine: see similarity.py (same kernel, threshold instead of k).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from invoicenet_spark.functions.analyzer import tokens_col
from invoicenet_spark.ops.text_analysis import fingerprint


def exact_dedup(df: DataFrame, text_col: str = "text", key_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-key row per identical (canonicalized) text."""
    fp = df.withColumn("fp", fingerprint(text_col))
    return (
        fp.groupBy("fp")
        .agg(F.min(key_col).alias(key_col), F.count("*").alias("n_copies"))
        .select(key_col, "fp", "n_copies")
    )


def shingles_df(df: DataFrame, text_col: str = "text", key_col: str = "doc_id", n: int = 3):
    """(key, shingle) — distinct word n-gram shingles per doc, JVM-side."""
    toks = tokens_col(text_col)
    sh = F.array_distinct(
        F.when(
            F.size(toks) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1)),
                lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
            ),
        ).otherwise(F.array().cast("array<string>"))
    )
    return df.select(key_col, F.explode(sh).alias("shingle"))


def jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard over all pairs sharing ≥1 shingle.

    Output: (id_a, id_b, jaccard) with id_a < id_b. The shared-shingle join
    is the inverted-index trick: pairs that share nothing never meet.
    """
    sh = shingles_df(df, text_col, key_col, n).alias("a")
    sizes = sh.groupBy(key_col).agg(F.count("*").alias("n_sh"))
    b = shingles_df(df, text_col, key_col, n).alias("b")
    inter = (
        sh.join(b, F.col(f"a.shingle") == F.col(f"b.shingle"))
        .where(F.col(f"a.{key_col}") < F.col(f"b.{key_col}"))
        .groupBy(
            F.col(f"a.{key_col}").alias("id_a"), F.col(f"b.{key_col}").alias("id_b")
        )
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col(key_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(key_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            (F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))).cast(
                "double"
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    n: int = 3,
    num_perm: int = 16,
) -> DataFrame:
    """(key, sig array<long>): k minhashes, each min(xxhash64(seed_i, shingle))
    — one groupBy with k JVM-side min() aggregates, no Python."""
    sh = shingles_df(df, text_col, key_col, n)
    aggs = [
        F.min(F.xxhash64(F.lit(i), F.col("shingle"))).alias(f"h{i}") for i in range(num_perm)
    ]
    wide = sh.groupBy(key_col).agg(*aggs)
    return wide.select(key_col, F.array(*[f"h{i}" for i in range(num_perm)]).alias("sig"))


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    n: int = 3,
    num_perm: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """MinHash → LSH band-bucket candidates → exact-Jaccard verification.

    Banding: num_perm/bands rows per band; candidate iff any band matches
    exactly. Verification recomputes true Jaccard on the candidates only.
    """
    rows = num_perm // bands
    sig = minhash_signatures(df, text_col, key_col, n, num_perm)
    band_cols = [
        F.struct(
            F.lit(bi).alias("band"),
            F.xxhash64(*[F.col("sig")[bi * rows + r] for r in range(rows)]).alias("bh"),
        )
        for bi in range(bands)
    ]
    banded = sig.select(key_col, F.explode(F.array(*band_cols)).alias("b")).select(
        key_col, F.col("b.band").alias("band"), F.col("b.bh").alias("bh")
    )
    a = banded.alias("x")
    b = banded.alias("y")
    cand = (
        a.join(b, ["band", "bh"])
        .where(F.col(f"x.{key_col}") < F.col(f"y.{key_col}"))
        .select(
            F.col(f"x.{key_col}").alias("id_a"), F.col(f"y.{key_col}").alias("id_b")
        )
        .distinct()
    )
    verified = jaccard_pairs(df, text_col, key_col, n, threshold).alias("v")
    return cand.alias("c").join(
        verified,
        (F.col("c.id_a") == F.col("v.id_a")) & (F.col("c.id_b") == F.col("v.id_b")),
    ).select("c.id_a", "c.id_b", "v.jaccard")


def simhash_signatures(
    df: DataFrame, text_col: str = "text", key_col: str = "doc_id", bits: int = 64
) -> DataFrame:
    """64-bit SimHash per doc, fully JVM-side: per (doc, term) tf-weighted
    ±1 vote per bit, sign-aggregated. Bits are extracted with shiftright —
    64 aggregate expressions, one shuffle."""
    toks = (
        df.select(key_col, F.explode(tokens_col(text_col)).alias("term"))
        .groupBy(key_col, "term")
        .agg(F.count("*").alias("tf"))
        .withColumn("h", F.xxhash64("term"))
    )
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, F.col("tf")).otherwise(
                -F.col("tf")
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


def simhash_near_dups(
    df: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    max_hamming: int = 3,
    bands: int = 4,
) -> DataFrame:
    """Near-dups = pairs with Hamming(simhash) ≤ max_hamming, candidates via
    exact match on one of `bands` 16-bit bands (pigeonhole: ≤3 flipped bits
    cannot touch all 4 bands)."""
    sig = simhash_signatures(df, text_col, key_col)
    width = 64 // bands
    band_cols = [
        F.struct(
            F.lit(bi).alias("band"),
            F.shiftright(F.col("simhash"), bi * width)
            .bitwiseAND(F.lit((1 << width) - 1))
            .alias("bh"),
        )
        for bi in range(bands)
    ]
    banded = sig.select(key_col, "simhash", F.explode(F.array(*band_cols)).alias("b")).select(
        key_col, "simhash", F.col("b.band").alias("band"), F.col("b.bh").alias("bh")
    )
    a, b = banded.alias("x"), banded.alias("y")
    cand = (
        a.join(b, ["band", "bh"])
        .where(F.col(f"x.{key_col}") < F.col(f"y.{key_col}"))
        .select(
            F.col(f"x.{key_col}").alias("id_a"),
            F.col(f"y.{key_col}").alias("id_b"),
            F.col("x.simhash").alias("sa"),
            F.col("y.simhash").alias("sb"),
        )
        .distinct()
    )
    return (
        cand.withColumn("hamming", F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))))
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
