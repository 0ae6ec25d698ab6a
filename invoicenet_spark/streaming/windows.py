"""Structured Streaming windowed aggregation with late-data handling.

SURVEY.md §2.10: the reference is batch-only; its prefetch/repeat pipeline
(invoicenet/acp/data.py:307-309) maps to pipelined stages, and its
checkpoint-on-improvement maps to snapshot-incremental builds
(streaming/incremental.py). This module adds the genuinely streaming
surface a web-scale ingest needs: event-time tumbling windows with a
watermark, so late events are folded in until the watermark passes and
dropped after — the standard Spark pattern, wrapped for the events schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def windowed_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Tumbling event-time window: (window_start, event_type, n, total).

    Works for both batch and streaming inputs (same plan; watermark is a
    no-op in batch mode).
    """
    e = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        e.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total")
    )


def stream_windowed_counts(spark, source_dir: str, query_name: str = "windowed_out"):
    """File-source stream → watermarked windowed agg → memory sink.
    Returns the StreamingQuery; caller drives it (availableNow trigger)."""
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(source_dir)
    agg = windowed_counts(stream)
    return (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
