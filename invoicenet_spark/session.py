"""SparkSession factory with engine defaults.

Local-mode settings follow the public Spark tuning guidance: shuffle
partitions ≈ cores (not the 200 default), AQE on (runtime coalesce + skew
split), Arrow enabled for all pandas UDF exchange, UTC session timezone so
DuckDB oracle comparisons are stable.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "invoicenet_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    driver_memory: str = "48g",
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for this engine.

    ``cores=None`` → ``local[*]``. On a real cluster this function is a
    no-op passthrough: spark-submit provides the master and memory, and we
    only set SQL-level confs (AQE, Arrow, shuffle partitions).
    """
    master = f"local[{cores}]" if cores else os.environ.get("SPARK_MASTER", "local[*]")
    if shuffle_partitions is None:
        shuffle_partitions = cores if cores else 32

    # Shuffle/spill dir: prefer RAM-backed storage when present — the
    # profiled build was I/O-bound on shuffle writes, not CPU-bound
    # (60-90% idle at local[32]). On a real cluster spark.local.dir
    # points at the executors' NVMe array; the engine only needs it fast.
    local_dir = None
    if os.path.isdir("/dev/shm") and os.access("/dev/shm", os.W_OK):
        local_dir = "/dev/shm/spark_local"
        os.makedirs(local_dir, exist_ok=True)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.driver.memory", driver_memory)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Sized for GROUPED rows (one row per posting list, nested arrays):
        # 8k groups x ~350 postings x 20B ≈ 60MB/batch/worker. 65536 here
        # caused 32 workers x ~0.5GB batch spikes → page-fault storm (93%
        # system time) on the encode stage.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "8192")
        # Critical at high local parallelism: without explicit reuse,
        # Spark 4.1 local mode cold-starts a Python worker per task —
        # measured 8x slowdown of UDF stages at local[32].
        .config("spark.python.worker.reuse", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.compression.codec", "snappy")
    )
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
