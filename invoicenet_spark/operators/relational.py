"""Relational operator ports from SURVEY.md §2 not already covered by the
index/query/dedup modules. Each is a small composition of built-in
DataFrame ops (JVM-side, Catalyst-optimized) with a DuckDB-SQL twin in
entrypoints.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F, types as T


def bounded_vocab_lookup(
    df: DataFrame,
    col: str,
    vocab: list[str],
    out_col: str = "token_id",
    unk: int = 0,
) -> DataFrame:
    """H3 — bounded vocabulary with UNK (invoicenet/common/data.py:37-57):
    value → id from a fixed dict, OOV → unk. Broadcast map built as a
    literal MAP expression (no join, no UDF)."""
    pairs: list[Column] = []
    for i, w in enumerate(vocab, start=1):
        pairs.extend([F.lit(w), F.lit(i)])
    m = F.create_map(*pairs)
    return df.withColumn(out_col, F.coalesce(m[F.col(col)], F.lit(unk)).cast("long"))


def train_val_split(
    df: DataFrame, key: str, val_fraction_denom: int = 5
) -> DataFrame:
    """E2 — deterministic split (prepare_data.py:102-104 slices after
    ordering; engine uses pmod(xxhash64(key), d) so the split is stable
    under any partitioning — no global order needed)."""
    bucket = F.pmod(F.xxhash64(F.col(key)), F.lit(val_fraction_denom))
    return df.withColumn("split", F.when(bucket == 0, F.lit("val")).otherwise(F.lit("train")))


def nearest_neighbor_1d(
    points: DataFrame,
    probes: DataFrame,
    value_col: str,
    probe_col: str,
    point_key: str,
    probe_key: str,
) -> DataFrame:
    """J5/K2 — argmin nearest match (invoicenet/gui/viewer.py:243-251:
    nearest word to a drawn rect by L1 distance). For each probe, the
    point minimizing |value - probe|, ties broken by point_key asc.

    Scale shape (round 5, replacing the crossJoin): probe values broadcast
    into ONE mapInPandas pass over the points — each Arrow batch sorts its
    values once and emits, per probe, its nearest-below and nearest-above
    candidates (run-start indices so equal-value ties surface the smallest
    key), ≤ 2·n_probes rows per batch — then a single min(struct(dist,
    key)) aggregation picks the global argmin with the same deterministic
    tie-break the old Window had. Work is O(points·log(batch) +
    probes·batches), never points×probes; probes must fit in executor
    memory (they are the op's small side by definition)."""
    import numpy as np
    import pandas as pd

    probe_pd = probes.select(probe_key, probe_col).toPandas()
    pvals = probe_pd[probe_col].to_numpy(dtype=np.float64)
    pids = probe_pd[probe_key].to_numpy()
    pk_field = points.schema[point_key]
    pr_field = probes.schema[probe_key]
    out_schema = T.StructType(
        [pr_field, pk_field, T.StructField("dist", T.DoubleType())]
    )

    def gen(batches):
        for pdf in batches:
            v = pdf[value_col].to_numpy(dtype=np.float64)
            keys = pdf[point_key].to_numpy()
            if v.size == 0 or pvals.size == 0:
                continue
            order = np.lexsort((keys, v))  # by value, then key (tie runs)
            vs, ks = v[order], keys[order]
            j = np.searchsorted(vs, pvals, side="left")
            rows = {pr_field.name: [], pk_field.name: [], "dist": []}
            for idx, valid in (
                (j - 1, j > 0),  # nearest value strictly below (run end)
                (np.minimum(j, vs.size - 1), j < vs.size),  # at/above
            ):
                if not valid.any():
                    continue
                ci = idx[valid]
                # run start = smallest key among equal values (global
                # tie-break is (dist, key) — the run shares one dist)
                ci = np.searchsorted(vs, vs[ci], side="left")
                rows[pr_field.name].extend(pids[valid])
                rows[pk_field.name].extend(ks[ci])
                rows["dist"].extend(np.abs(vs[ci] - pvals[valid]))
            yield pd.DataFrame(rows)

    cand = points.select(point_key, value_col).mapInPandas(gen, schema=out_schema)
    return (
        cand.groupBy(probe_key)
        .agg(F.min(F.struct(F.col("dist"), F.col(point_key))).alias("_m"))
        .select(
            probe_key,
            F.col(f"_m.{point_key}").alias(point_key),
            F.col("_m.dist").alias("dist"),
        )
    )


def masked_mean(df: DataFrame, value_col: str, mask_col: Column) -> DataFrame:
    """A4 — masked mean (invoicenet/acp/acp.py:74-80: mean CE over non-pad):
    sum(x*mask)/sum(mask) as a single aggregate."""
    m = mask_col.cast("double")
    return df.agg(
        (F.sum(F.col(value_col) * m) / F.sum(m)).alias("masked_mean"),
        F.sum(m).cast("long").alias("n_unmasked"),
    )


def running_best(
    df: DataFrame, order_col: str, value_col: str, partition_cols: list[str] | None = None
) -> DataFrame:
    """A5 — running min / best-so-far tracking (invoicenet/common/
    trainer.py:37,68-71: keep best val loss, save on improvement).
    Emits is_improvement = this row beats everything before it.

    partition_cols=None is the reference's GLOBAL best-so-far — inherently
    one total order, so the Window is unpartitioned (fine on a metrics
    stream, wrong shape for big data). Pass partition_cols (e.g. per
    experiment / per user) for the scale-safe keyed variant — then the
    window shuffles on the keys and no single task sees the whole frame."""
    w = Window.orderBy(F.col(order_col)).rowsBetween(Window.unboundedPreceding, 0)
    wprev = Window.orderBy(F.col(order_col)).rowsBetween(Window.unboundedPreceding, -1)
    if partition_cols:
        w = w.partitionBy(*partition_cols)
        wprev = wprev.partitionBy(*partition_cols)
    return (
        df.withColumn("best_so_far", F.min(value_col).over(w))
        .withColumn(
            "is_improvement",
            F.col(value_col) < F.coalesce(F.min(value_col).over(wprev), F.lit(float("inf"))),
        )
    )


def union_merge_last_writer_wins(
    old: DataFrame, new: DataFrame, key: str, version_col: str
) -> DataFrame:
    """E3 — label union-merge (predict.py:79-88: merge new predictions into
    existing JSON, new values win). MERGE INTO emulated as unionByName +
    row_number over version desc per key."""
    both = old.unionByName(new)
    w = Window.partitionBy(key).orderBy(F.col(version_col).desc())
    return both.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1).drop("_rn")


def project_with_defaults(df: DataFrame, fields: dict[str, str]) -> DataFrame:
    """P3 — field-presence projection (prepare_data.py:52-61: project labels
    onto the FIELDS registry, '' default for absent fields)."""
    cols = []
    for name, default in fields.items():
        if name in df.columns:
            cols.append(F.coalesce(F.col(name), F.lit(default)).alias(name))
        else:
            cols.append(F.lit(default).alias(name))
    return df.select(*cols)
