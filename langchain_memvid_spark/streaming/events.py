"""Structured Streaming over the events table.

The reference has NO streaming surface (SURVEY.md §2b: its only
"streaming" is a generator-based video decode). These operators are
the north-star extension: the same event-analytics queries as the
batch registry (events_hourly / events_sessionize), expressed as
incremental streams with watermarks for late data.

Design notes for scale:
  - file source + `trigger(availableNow=True)` gives reproducible
    batch-equivalent runs in tests; in production the same code runs
    against Kafka by swapping the reader.
  - watermarks bound state: tumbling/sliding windows drop state older
    than the watermark; session windows merge-and-expire per key.
  - aggregations are partial (map-side) before the state-store
    shuffle, same as batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)

# nanos-as-long variant (the testdata file stores TIMESTAMP(NANOS),
# which Spark reads as long under spark.sql.legacy.parquet.nanosAsLong)
EVENTS_SCHEMA_NANOS = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", LongType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def read_events_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream of events; converts nano-long ts to micros
    exactly like the batch loader (sources/catalog.py)."""
    import os

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # The file stream source accepts directories or GLOBS, not plain
    # file paths. Turn ".../events.parquet" into ".../events.parque[t]"
    # so a single read-only file works without copying it anywhere.
    base = os.path.dirname(path.rstrip("/")) or "."
    if not any(c in path for c in "*?["):
        path = f"{path[:-1]}[{path[-1]}]"
    raw = (
        spark.readStream.schema(EVENTS_SCHEMA_NANOS)
        .option("basePath", base)
        .parquet(path)
    )
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def tumbling_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling-window per-type counts with a late-data watermark."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.round(F.col("value"), 2).cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            F.date_format(F.col("w.end"), "yyyy-MM-dd HH:mm:ss").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_user_activity(
    events: DataFrame, window: str = "1 hour", slide: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Sliding-window distinct-ish user activity (count per window)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), F.col("user_id"))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "user_id",
            "n_events",
        )
    )


def session_windows(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Session windows per user (gap-based) — the streaming twin of the
    batch gaps-and-islands sessionization (operators/relational.py)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format(F.col("w.end"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def run_to_memory(stream_df: DataFrame, name: str, mode: str = "complete") -> DataFrame:
    """Execute a streaming query to completion (availableNow trigger)
    against an in-memory sink; returns the result as a batch DataFrame."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(name)
