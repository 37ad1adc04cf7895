"""Event-time windowed aggregation with watermark (late-data handling).

The reference has no event-time concept (SURVEY §2.9) — this is part of the
training-data/streaming surface: tumbling-window counts per key over an
unbounded event stream, with a watermark bounding how late an event may
arrive before its window is finalized and state evicted.  Plan shape:
stateful streaming aggregation (partial + state-store merge), shuffle on
(window, key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(events: DataFrame, ts_col: str = "ts",
                          key_col: str = "event_type",
                          window: str = "10 minutes",
                          slide: str | None = None,
                          watermark: str = "30 minutes",
                          value_col: str | None = "value") -> DataFrame:
    """events (streaming or batch) → (win_start, win_end, key, n_events
    [, total_value]).  ``ts_col`` may be numeric (epoch seconds) or
    timestamp.  ``total_value`` is emitted only when ``value_col`` names a
    column that exists (pass None, or a schema without it, to count only)."""
    ts = F.col(ts_col)
    src = events.withColumn("_ts", ts.cast("timestamp"))
    if src.isStreaming:
        src = src.withWatermark("_ts", watermark)
    win = F.window("_ts", window, slide) if slide else F.window("_ts", window)
    aggs = [F.count(F.lit(1)).alias("n_events")]
    sum_value = value_col is not None and value_col in events.columns
    if sum_value:
        aggs.append(F.round(F.sum(value_col), 2).alias("total_value"))
    return (
        src.groupBy(win.alias("win"), F.col(key_col).alias("key"))
        .agg(*aggs)
        .select(F.col("win.start").alias("win_start"),
                F.col("win.end").alias("win_end"),
                "key", "n_events",
                *(["total_value"] if sum_value else []))
    )


def session_window_counts(events: DataFrame, ts_col: str = "ts",
                          key_col: str = "user_id",
                          gap: str = "30 minutes",
                          watermark: str = "1 hour",
                          value_col: str | None = "value") -> DataFrame:
    """Per-key session windows (merge while consecutive events are at
    most ``gap`` apart — an event landing exactly on the previous
    window's end joins it; only gap > threshold starts a new session) →
    (win_start, win_end, key, n_events[, total_value]).  In streaming the
    watermark bounds open-session state; in batch it is a plain shuffle on
    (key) + sort-merge of each key's events."""
    ts = F.col(ts_col).cast("timestamp")
    src = events.withColumn("_ts", ts)
    if src.isStreaming:
        src = src.withWatermark("_ts", watermark)
    aggs = [F.count(F.lit(1)).alias("n_events")]
    sum_value = value_col is not None and value_col in events.columns
    if sum_value:
        aggs.append(F.round(F.sum(value_col), 2).alias("total_value"))
    return (
        src.groupBy(F.session_window(F.col("_ts"), gap).alias("win"),
                    F.col(key_col).alias("key"))
        .agg(*aggs)
        .select(F.col("win.start").alias("win_start"),
                F.col("win.end").alias("win_end"),
                "key", "n_events",
                *(["total_value"] if sum_value else []))
    )


def run_windowed_counts(spark, input_path: str, checkpoint: str,
                        schema: str,
                        query_name: str = "windowed_counts",
                        **kwargs):
    """File-stream wrapper writing to an in-memory sink (complete mode) —
    the pattern a real deployment points at Kafka + a table sink."""
    events = spark.readStream.schema(schema).parquet(input_path)
    agg = windowed_event_counts(events, **kwargs)
    return (
        agg.writeStream.outputMode("complete")
        .format("memory").queryName(query_name)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
