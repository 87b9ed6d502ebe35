"""Multimodal (image/audio/video) column handling.

Media are opaque `binary` columns plus typed metadata — the same
"payload is an encoded blob, metadata rides alongside" split the
reference uses for its QR-frame video archive
(/root/reference/src/langchain_memvid/encoder.py:190-198; its video
codecs ≙ our media codecs). All Spark-side plumbing (schema,
partitioning, Arrow batch shape, UDF signatures) is real and tested;
the actual codec calls are STUBBED — image/audio libraries are not in
this container — behind `decoder="fake"` (deterministic sha256-seeded
features) or `decoder="real"` (raises NotImplementedError at the
exact point cv2/PIL/ffmpeg would be invoked).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),  # image | audio | video
        StructField("content", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("meta", MapType(StringType(), StringType())),
    ]
)

FEATURE_DIM = 32


def synthesize_media(documents: DataFrame, media_type: str = "image") -> DataFrame:
    """Deterministic fake media table derived from the documents table:
    content = sha256-stretched bytes of the text (stands in for an
    encoded image/audio blob). Real ingest would use
    spark.read.format('binaryFile')."""
    blob = F.unhex(F.sha2(F.col("text"), 256))
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.lit(media_type).alias("media_type"),
        blob.alias("content"),
        F.lit(64).alias("width"),
        F.lit(48).alias("height"),
        (F.col("doc_id") % 8 + 1).cast("int").alias("n_frames"),
        F.create_map(F.lit("source"), F.col("source")).alias("meta"),
    )


def _fake_features(content: bytes, dim: int = FEATURE_DIM) -> list[float]:
    seed = int(hashlib.sha256(content).hexdigest()[:8], 16)
    rng = np.random.RandomState(seed)
    v = rng.uniform(-1.0, 1.0, dim).astype(np.float32)
    n = float(np.linalg.norm(v)) or 1.0
    return (v / n).tolist()


def extract_features(media: DataFrame, decoder: str = "fake") -> DataFrame:
    """Decode + feature-extract each blob via mapInPandas (Arrow
    batches; one python worker per partition — at scale this is where
    GPU inference batches would run).

    decoder='real' marks where cv2.imdecode / torchaudio.load / a
    vision tower would be called — NotImplementedError in this
    container."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder == "real":
                raise NotImplementedError(
                    "real decoders (cv2/PIL/torchaudio) are not available in "
                    "this container; use decoder='fake'"
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "features": [_fake_features(bytes(c)) for c in pdf["content"]],
                    "content_bytes": [len(bytes(c)) for c in pdf["content"]],
                }
            )

    return media.mapInPandas(
        extract,
        "media_id long, media_type string, features array<float>, content_bytes long",
    )


def resize_images(media: DataFrame, width: int, height: int, decoder: str = "fake") -> DataFrame:
    """Resize plumbing: output schema/partitioning real, pixel work
    stubbed (fake mode re-hashes content with the target size so output
    is deterministic)."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder == "real":
                raise NotImplementedError("PIL/cv2 resize not available; use decoder='fake'")
            out = pdf.copy()
            out["content"] = [
                hashlib.sha256(bytes(c) + f"{width}x{height}".encode()).digest()
                for c in pdf["content"]
            ]
            out["width"] = width
            out["height"] = height
            yield out

    return media.filter(F.col("media_type") == "image").mapInPandas(resize, media.schema)


def sample_frames(media: DataFrame, every_nth: int = 2) -> DataFrame:
    """Frame sampling for video rows: explode n_frames into (media_id,
    frame_no) rows, keep every nth — pure Catalyst (sequence+explode),
    the decode of sampled frames is then a batched UDF over the
    exploded set."""
    frames = media.filter(F.col("media_type") == "video").select(
        "media_id",
        F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1)).alias("frame_no"),
    )
    return frames.filter(F.col("frame_no") % every_nth == 0)
