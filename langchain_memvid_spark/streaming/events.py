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


def read_events_stream(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int | None = None,
    nanos: bool | None = None,
) -> DataFrame:
    """File-source stream of events. The file stream source needs an
    explicit schema, and the testdata's ts physical type has varied
    across generator versions (TIMESTAMP(NANOS) → read as long under
    nanosAsLong; TIMESTAMP(MICROS) → a real timestamp). nanos=None
    (default) autodetects from a one-footer batch schema read — exactly
    the representation the batch loader (sources/catalog.py) sees — so
    stream and batch stay bit-identical whatever the generator wrote.
    Pass nanos=True/False to pin the layout explicitly.

    max_files_per_trigger splits a multi-file directory into that many
    microbatches — the test harness's way of exercising cross-batch
    state (a production Kafka source batches by offset ranges)."""
    import os

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    if nanos is None:
        inferred = spark.read.parquet(path).schema
        nanos = any(
            f.name == "ts" and f.dataType.typeName() in ("long", "bigint")
            for f in inferred.fields
        )
    # The file stream source accepts directories or GLOBS, not plain
    # file paths. Turn ".../events.parquet" into ".../events.parque[t]"
    # so a single read-only file works without copying it anywhere.
    base = os.path.dirname(path.rstrip("/")) or "."
    if not any(c in path for c in "*?["):
        path = f"{path[:-1]}[{path[-1]}]"
    schema = EVENTS_SCHEMA_NANOS if nanos else EVENTS_SCHEMA
    reader = spark.readStream.schema(schema).option("basePath", base)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    raw = reader.parquet(path)
    if nanos:
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return raw


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


def run_to_memory(
    stream_df: DataFrame,
    name: str,
    mode: str = "complete",
    state_partitions: int | None = None,
) -> DataFrame:
    """Execute a streaming query to completion (availableNow trigger)
    against an in-memory sink; returns the result as a batch DataFrame.

    state_partitions sizes the state-store shuffle for THIS query:
    stateful operators should match key cardinality, not inherit the
    batch shuffle default (32 state stores for 150 keys tripled the
    wall time locally). Spark pins the number at first start for the
    checkpoint's lifetime, so the conf only needs to hold across
    .start() — set-and-restore is safe for sequential callers."""
    spark = stream_df.sparkSession
    old = spark.conf.get("spark.sql.shuffle.partitions")
    if state_partitions:
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        q = (
            stream_df.writeStream.format("memory")
            .queryName(name)
            .outputMode(mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    return spark.table(name)


def user_lifetime_stats(events: DataFrame) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): per-user
    lifetime counters that survive across microbatches — the pattern
    the built-in windowed aggregations can't express (no window: state
    lives for the key's lifetime, updated incrementally).

    State = (n_events, value_cents, max_cents). Money accumulates in
    integer cents so the running sum is exact regardless of batch
    order; each update emits the NEW totals for the key (update output
    mode — downstream sinks upsert by user_id)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = "user_id long, n_events long, sum_value double, max_value double"
    state_schema = "n long, cents long, maxc long"

    def update(key, pdfs, state):
        # numpy, not pandas, inside the per-key body: this function
        # runs once per key per microbatch, so Series-op overhead
        # multiplies by key count (1500 keys cost ~0.2 s of pure
        # pandas dispatch at sf0.1 — optimization r14, guide §4.2);
        # np.rint is the same round-half-even as Series.round
        import numpy as np

        n, cents, maxc = state.get if state.exists else (0, 0, -(1 << 62))
        for pdf in pdfs:
            v = pdf["value"].to_numpy()
            n += v.size
            if v.size:
                c = np.rint(v * 100).astype("int64")
                cents += int(c.sum())
                m = int(c.max())
                if m > maxc:
                    maxc = m
        state.update((n, cents, maxc))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "sum_value": [cents / 100.0],
                "max_value": [maxc / 100.0],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def final_user_stats(updates: DataFrame) -> DataFrame:
    """Collapse an update-mode memory-sink table (one row per key per
    microbatch) to each key's final state: the row with the highest
    n_events per user."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (
        updates.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def stream_click_purchase_join(
    clicks: DataFrame,
    purchases: DataFrame,
    window_minutes: int = 30,
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream interval join: every (click, purchase) pair of the
    same user where the purchase lands within `window_minutes` after
    the click. Both sides carry watermarks and the join condition
    bounds event time on both ends — that pair is what lets the state
    store EVICT buffered rows instead of holding both streams forever
    (the defining constraint of stream-stream joins at scale)."""
    c = (
        clicks.withWatermark("ts", watermark)
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user_id"),
            F.col("ts").alias("click_ts"),
        )
    )
    p = (
        purchases.withWatermark("ts", watermark)
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
        )
    )
    cond = (
        (F.col("c_user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") > F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {window_minutes} MINUTES"))
    )
    return c.join(p, cond).select(
        "click_id",
        "purchase_id",
        F.col("c_user_id").alias("user_id"),
        F.date_format("click_ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
        F.date_format("purchase_ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        (F.col("purchase_ts").cast("long") - F.col("click_ts").cast("long")).alias("gap_seconds"),
    )


def start_parquet_sink(
    stream_df: DataFrame,
    out_path: str,
    checkpoint_path: str,
    max_files_per_trigger: int | None = None,
    partition_by: list[str] | None = None,
) -> "object":
    """Exactly-once parquet sink: Spark's native file sink commits each
    microbatch atomically through the checkpoint's write-ahead log, so
    a killed-and-restarted query resumes WITHOUT duplicating committed
    batches (verified by the kill/restart test). ``partition_by``
    writes a Hive-style layout (e.g. cluster_id=N dirs for the IVF
    stream ingest) so downstream reads partition-prune. Returns the
    started StreamingQuery; callers own stop/await."""
    writer = (
        stream_df.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
    )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    return writer.start()
