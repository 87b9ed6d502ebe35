"""Parquet small-file compaction.

Streaming sinks and incremental ingests leave thousands of tiny files
per partition; at 100 TB the resulting footer reads and task overhead
dominate scan time. Compaction rewrites a table at a target file size
with an overwrite-swap (write to a sibling temp dir, then rename).

Swap semantics are SINGLE-WRITER, NO-CONCURRENT-READER: between the
two renames the table path briefly does not exist, and a crash there
leaves the data under a ``__old_*`` suffixed name (recoverable by
hand, never silently lost — the new data is fully written before the
first rename).  A truly atomic cutover for live readers needs a
manifest/symlink indirection layer (Delta/Iceberg-style), out of scope
for a plain-parquet table.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import SparkSession


def table_bytes(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        total += sum(os.path.getsize(os.path.join(root, f)) for f in files if not f.startswith("_"))
    return total


def parquet_file_count(path: str) -> int:
    n = 0
    for _, _, files in os.walk(path):
        n += sum(1 for f in files if f.endswith(".parquet"))
    return n


def compact_parquet(
    spark: SparkSession, path: str, target_file_bytes: int = 128 * 1024 * 1024
) -> int:
    """Rewrite `path` with ceil(table_bytes / target_file_bytes) files.

    Returns the new file count. Uses repartition (round-robin, even
    sizes) rather than coalesce: coalesce(n) would also narrow the
    UPSTREAM read parallelism to n tasks, so a large compaction would
    read with too few tasks; repartition keeps the scan wide and only
    the write narrow. The rewrite lands in a temp sibling dir and swaps
    in via two renames with the old data removed last — safe for a
    single writer with no concurrent readers (see module docstring for
    the exact crash/reader window)."""
    size = table_bytes(path)
    n_files = max(1, -(-size // target_file_bytes))
    df = spark.read.parquet(path)
    tmp = f"{path.rstrip('/')}__compact_{uuid.uuid4().hex[:8]}"
    df.repartition(n_files).write.mode("overwrite").parquet(tmp)
    old = f"{path.rstrip('/')}__old_{uuid.uuid4().hex[:8]}"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return parquet_file_count(path)
