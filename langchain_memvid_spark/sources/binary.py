"""Binary-file media ingest: directories of encoded media files →
the MEDIA table shape.

The reference ingests media by decoding a video file it wrote itself
(/root/reference/src/langchain_memvid/video/default.py:244-322); the
Spark-native equivalent is the `binaryFile` datasource — each file
becomes a (path, modificationTime, length, content) row, read in
parallel across executors with per-file pruning via pathGlobFilter.
Pair with multimodal.binary.decode_media_info to turn raw blobs into
typed header fields.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_media_dir(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
) -> DataFrame:
    """Read a directory of media files as (media_id, media_type,
    content) rows.

    media_type is sniffed from the file extension (the header parsers
    downstream validate the actual bytes — a mislabeled file fails
    loudly in decode_media_info, not silently). media_id is a stable
    hash of the file path RELATIVE to the load root (not the basename:
    two `part.png` files in different subdirectories must not collide
    into one id), so re-reading the same directory yields the same ids
    regardless of listing order — no zipWithIndex, no driver listing,
    scales to millions of files.
    """
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    raw = reader.load(path)
    # binaryFile's path column is a URI (file:/abs/root/sub/f.png);
    # strip the scheme and the load root so the hashed key is the
    # root-relative path — stable if the tree is ever relocated
    root_abs = os.path.abspath(path).rstrip("/")
    no_scheme = F.regexp_replace(F.col("path"), r"^[a-zA-Z][\w+.-]*:(//)?", "")
    rel = F.regexp_replace(no_scheme, "^" + re.escape(root_abs) + "/?", "")
    name = F.element_at(F.split(F.col("path"), "/"), -1)
    ext = F.lower(F.element_at(F.split(name, r"\."), -1))
    return raw.select(
        F.xxhash64(rel).alias("media_id"),
        F.when(ext == "png", "image")
        .when(ext == "wav", "audio")
        .otherwise("unknown")
        .alias("media_type"),
        F.col("content"),
        name.alias("file_name"),
        F.col("length").alias("file_bytes"),
    )


def write_media_dir(media: DataFrame, path: str) -> int:
    """Materialize (media_id, media_type, content) rows as individual
    .png/.wav files — the fixture-side inverse of read_media_dir (small
    corpora only: one driver-side pass; real pipelines keep blobs in
    parquet/tar shards and this exists to round-trip the binaryFile
    source in tests)."""
    os.makedirs(path, exist_ok=True)
    n = 0
    for r in media.select("media_id", "media_type", "content").collect():
        ext = "png" if r["media_type"] == "image" else "wav"
        with open(os.path.join(path, f"m{r['media_id']}.{ext}"), "wb") as f:
            f.write(bytes(r["content"]))
        n += 1
    return n
