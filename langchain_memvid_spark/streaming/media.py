"""Streaming MEDIA ingest gate — the multimodal member of the
streaming dedup family.

A production scrape delivers media as a file stream; every arriving
batch must be checked against the already-kept corpus BEFORE it is
admitted (the text analogs are near_dedup_stream_vs_corpus for
signatures and stream_similarity_join for retrieval).  A per-arrival
verdict requires a groupBy over the band join, which Spark's native
streaming sinks cannot express statelessly — so this uses the same
idempotent-foreachBatch recipe as stream_similarity_join: each
microbatch runs the BATCH incremental kernel
(multimodal/binary.py incremental_{image,audio,video}_near_dup —
batch bands broadcast, ONE scan of the corpus signature table, zero
corpus-side shuffle) and OVERWRITES its own Hive partition
``out_path/batch_id=<id>``, so a replayed batch after a crash
rewrites identical bytes instead of duplicating.

The corpus side is the PERSISTED signature table —
MediaSignatureStore.signatures() or any signer output written at
ingest (8–32 bytes per item): re-decoding 100 TB of corpus media per
microbatch would be absurd, and the stream never re-signs prior
arrivals either (each batch signs exactly its own blobs).
"""

from __future__ import annotations

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession

from langchain_memvid_spark.multimodal import binary as mm
from langchain_memvid_spark.streaming.documents import _read_table_stream

MEDIA_STREAM_SCHEMA = "media_id LONG, media_type STRING, content BINARY"

_INCREMENTALS = {
    "image": mm.incremental_image_near_dup,
    "audio": mm.incremental_audio_near_dup,
    "video": mm.incremental_video_near_dup,
}


def stream_media_dedup_vs_corpus(
    spark: SparkSession,
    media_path: str,
    out_path: str,
    checkpoint_path: str,
    corpus_sig: DataFrame,
    modality: str = "image",
    max_hamming: int = 3,
    max_files_per_trigger: int | None = None,
    salvage: bool = False,
    hash_bits: int = 64,
    every_n: int = 1,
) -> DataFrame:
    """STREAMING ingest gate: arriving media files are deduped against
    the persisted corpus signature table, one incremental-kernel run
    per microbatch, exactly-once via idempotent per-batch-partition
    overwrite.  ``corpus_sig`` must be signed at the same
    ``hash_bits`` (and, for video, ``every_n``) as this gate signs
    arrivals with.

    Returns a batch read of the accumulated verdicts
    (media_id, is_dup, dup_of, decoded, batch_id — the
    partition-discovery column last, on the empty path too)."""
    if modality not in _INCREMENTALS:
        raise ValueError(
            f"modality must be one of {sorted(_INCREMENTALS)}, got {modality!r}"
        )
    if corpus_sig.isStreaming:  # pragma: no cover - contract guard
        raise ValueError("corpus_sig must be a static (batch) table")
    incremental = _INCREMENTALS[modality]
    stream = _read_table_stream(
        spark, media_path, MEDIA_STREAM_SCHEMA, max_files_per_trigger
    )

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        kwargs = dict(
            corpus_sig=corpus_sig,
            max_hamming=max_hamming,
            salvage=salvage,
            hash_bits=hash_bits,
        )
        if modality == "video":
            kwargs["every_n"] = every_n
        out = incremental(batch_df, **kwargs)
        out.write.mode("overwrite").parquet(f"{out_path}/batch_id={batch_id}")

    q = (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    try:
        return spark.read.parquet(out_path)
    except AnalysisException as e:
        cond = e.getCondition() if hasattr(e, "getCondition") else e.getErrorClass()
        if cond != "PATH_NOT_FOUND":
            raise
        # zero microbatches (empty source): typed empty frame with
        # batch_id LAST, matching the partitioned read (the ADVICE r8
        # column-order rule)
        return spark.createDataFrame(
            [],
            "media_id BIGINT, is_dup BOOLEAN, dup_of BIGINT, "
            "decoded BOOLEAN, batch_id INT",
        )
