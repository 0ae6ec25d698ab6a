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


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Batch sessionization: events within `gap_minutes` of the previous
    event of the same key share a session. Classic island detection —
    session_no = running count of gap-exceeding boundaries per key — all
    JVM window functions, one shuffle on the key. Output: one row per
    session (key, session_no, session_start, session_end, n_events,
    total_value).

    This is the BATCH twin of `stream_sessionize` (applyInPandasWithState);
    a parity test pins the two to identical session boundaries, and the
    DuckDB oracle pins this one exactly.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(ts_col, "event_id")
    # via timestamp: NTZ columns can't cast straight to long (session tz is
    # pinned to UTC, so the epoch is deterministic either way)
    sec = F.col(ts_col).cast("timestamp").cast("long")
    gap = sec - F.lag(sec).over(w)
    new_session = F.when(
        gap.isNull() | (gap > gap_minutes * 60), F.lit(1)
    ).otherwise(F.lit(0))
    sess = events.withColumn(
        "session_no",
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return sess.groupBy(key_col, "session_no").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


def stream_sessionize(
    spark,
    source_dir: str,
    gap_minutes: int = 30,
    query_name: str = "sessions_out",
):
    """Custom stateful streaming sessionization via applyInPandasWithState.

    State per user: (open-session start, last ts, n, total). An incoming
    micro-batch folds its (sorted) events into the open session or closes
    it when the gap is exceeded; closed sessions are EMITTED, the open one
    stays in state until the event-time timeout (watermark + gap) fires and
    flushes it. This is the §2.10 "custom stateful operator" surface: the
    semantics session_window can't express generically (arbitrary per-group
    state machine), done Arrow-batched, never per-row Python at the Spark
    row level.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    OUT_SCHEMA = (
        "user_id long, session_start timestamp, session_end timestamp, "
        "n_events long, total_value double"
    )
    STATE_SCHEMA = "start long, last long, n long, total double"
    gap_s = gap_minutes * 60

    def fold(key, pdfs, state: GroupState):
        user_id = key[0]
        closed = []
        if state.hasTimedOut:
            if state.exists:
                s, last, n, tot = state.get
                closed.append((user_id, s, last, n, tot))
                state.remove()
        else:
            rows = pd.concat(list(pdfs)).sort_values("ts")
            cur = list(state.get) if state.exists else None
            for ts_val, val in zip(
                rows["ts"].astype("int64") // 10**9, rows["value"]
            ):
                ts_val = int(ts_val)
                if cur is None:
                    cur = [ts_val, ts_val, 0, 0.0]
                elif ts_val - cur[1] > gap_s:
                    closed.append((user_id, cur[0], cur[1], cur[2], cur[3]))
                    cur = [ts_val, ts_val, 0, 0.0]
                cur[1] = max(cur[1], ts_val)
                cur[2] += 1
                cur[3] += float(val)
            state.update(tuple(cur))
            # clamp: for a group whose newest event sits at/behind the
            # watermark boundary, last_event+gap can be <= the current
            # watermark, and Spark rejects a timeout that isn't strictly
            # ahead of it (IllegalArgumentException fails the whole query).
            # Clamping to watermark+1ms keeps the group timing out on the
            # very next trigger — the semantics the gap intends.
            wm = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(max(wm + 1, (cur[1] + gap_s) * 1000))
        if not closed:
            yield pd.DataFrame(
                columns=["user_id", "session_start", "session_end", "n_events", "total_value"]
            )
            return
        out = pd.DataFrame(
            closed, columns=["user_id", "session_start", "session_end", "n_events", "total_value"]
        )
        out["session_start"] = pd.to_datetime(out["session_start"], unit="s")
        out["session_end"] = pd.to_datetime(out["session_end"], unit="s")
        yield out

    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(source_dir)
    sessions = (
        stream.withWatermark("ts", f"{gap_minutes} minutes")
        .groupBy("user_id")
        .applyInPandasWithState(
            fold, OUT_SCHEMA, STATE_SCHEMA, "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
    return (
        sessions.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
