"""EXT streaming analytics on the events stream (SURVEY §2.H extension).

The reference's streaming story is only the CDC queue; the engine adds
real event-time processing — tumbling/sliding windows with watermarked
late-data handling, session windows, and streaming dedup — all native
Structured Streaming operators (no custom state unless semantics demand
it). Batch-mode twins live in operators/timeseries.py and are what the
DuckDB oracle checks; these builders are exercised by
tests/test_streaming.py with a file source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from adv_big_data_indexing_spark.functions.exact import dec


def tumbling_counts(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """10-min tumbling window counts/sums; late rows beyond the watermark
    are dropped (the append-mode contract)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "600 seconds").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.sum(dec("value")).cast("double").alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_value")
    )


def sliding_counts(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "600 seconds", "300 seconds").alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
    )


def session_counts(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Native session windows (gap-close semantics identical to the batch
    lag/cumsum formulation in operators/timeseries.py)."""
    return (
        events.withWatermark("ts", "30 minutes")
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def dedup_events(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Streaming exactly-once-per-id projection: dropDuplicates on
    event_id within the watermark horizon."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["event_id"])
