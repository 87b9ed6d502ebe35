"""Scalable sequential id assignment.

The reference assigns doc_id = position in the metadata list and
renumbers 0..n-1 after deletes (/root/reference/src/langchain_memvid/
index.py:230,433-435). A naive Spark translation is
``row_number() OVER (ORDER BY ...)`` — a single-reducer global sort
that dies at 100 TB. Instead we use the two-phase offset pattern:

  1. within-partition ordinal (window partitioned by partition id — a
     per-partition-local operation, no global shuffle),
  2. per-partition counts → cumulative offsets (tiny driver-side
     aggregate, O(#partitions)),
  3. id = offset[pid] + ordinal.

This preserves the DataFrame's existing partition order (or an
explicit order column) and scales linearly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def add_sequential_ids(
    df: DataFrame,
    id_col: str = "doc_id",
    order_col: str | None = None,
    start: int = 0,
) -> DataFrame:
    """Assign dense sequential ids ``start..start+n-1``.

    If ``order_col`` is given, ids follow that total order *within each
    partition* and partitions are ordered by partition id — callers that
    need a strict global order should repartitionByRange(order_col)
    first (one range shuffle; still no single-reducer bottleneck —
    repartitionByRange assigns ascending ranges to ascending partition
    ids, so offset-by-pid composes into a strict global order).

    The ordinal window and the per-partition counts are two separate
    jobs over the same lineage; if the input were recomputed with a
    different physical partitioning between them, offsets could mismatch
    ordinals. localCheckpoint pins the materialized partitioning before
    either job runs — unlike .cache() its blocks are reclaimed by the
    ContextCleaner once the DataFrame is unreferenced, so repeated
    ingests don't accumulate pinned storage.
    """
    df = df.withColumn("__pid", F.spark_partition_id()).localCheckpoint()
    w = Window.partitionBy("__pid").orderBy(order_col if order_col else F.monotonically_increasing_id())
    with_ord = df.withColumn("__ord", F.row_number().over(w) - 1)

    counts = {r["__pid"]: r["cnt"] for r in df.groupBy("__pid").agg(F.count("*").alias("cnt")).collect()}
    offsets, acc = {}, start
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    spark = df.sparkSession
    offsets_df = spark.createDataFrame(
        [(pid, off) for pid, off in offsets.items()] or [(0, start)], "__pid INT, __off LONG"
    )
    return (
        with_ord.join(F.broadcast(offsets_df), "__pid", "left")
        .withColumn(id_col, (F.coalesce(F.col("__off"), F.lit(start)) + F.col("__ord")).cast("long"))
        .drop("__pid", "__ord", "__off")
    )
