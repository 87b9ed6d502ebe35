"""Structured Streaming tests: each streaming query, run with an
availableNow trigger over the events parquet, must equal its batch
twin computed with plain DataFrame ops on the same data."""

import pytest
from pyspark.sql import functions as F

from langchain_memvid_spark.sources.catalog import load_table
from langchain_memvid_spark.streaming import events as ev


@pytest.fixture(scope="module")
def batch_events(spark, sf_dir):
    return load_table(spark, sf_dir, "events").cache()


@pytest.fixture(scope="module")
def stream_events(spark, sf_dir):
    return ev.read_events_stream(spark, f"{sf_dir}/events.parquet")


def _sorted_rows(df, cols):
    return [tuple(r) for r in df.select(*cols).orderBy(*cols).collect()]


def test_tumbling_counts_matches_batch(spark, batch_events, stream_events):
    got = ev.run_to_memory(ev.tumbling_counts(stream_events), "t_tumbling")
    want = (
        batch_events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.round(F.col("value"), 2).cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            F.date_format("w.end", "yyyy-MM-dd HH:mm:ss").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    cols = ["window_start", "window_end", "event_type", "n_events", "sum_value"]
    assert _sorted_rows(got, cols) == _sorted_rows(want, cols)


def test_sliding_windows_cover_events(spark, batch_events, stream_events):
    got = ev.run_to_memory(ev.sliding_user_activity(stream_events), "t_sliding")
    # every event lands in exactly 2 sliding windows (1h window, 30m slide)
    total = got.agg(F.sum("n_events")).collect()[0][0]
    assert total == 2 * batch_events.count()


def test_session_windows_match_batch_sessionize(spark, batch_events, stream_events):
    from langchain_memvid_spark.operators.relational import events_sessionize

    got = ev.run_to_memory(ev.session_windows(stream_events), "t_session")
    want = events_sessionize(batch_events)
    # same number of sessions per user and same total session count
    assert got.count() == want.count()
    g = {(r["user_id"]): r["n"] for r in got.groupBy("user_id").agg(F.count("*").alias("n")).collect()}
    w = {(r["user_id"]): r["n"] for r in want.groupBy("user_id").agg(F.count("*").alias("n")).collect()}
    assert g == w


def test_user_lifetime_stats_state_survives_microbatches(spark, batch_events, sf_dir, tmp_path_factory):
    """Split events into 4 files → 4 microbatches (maxFilesPerTrigger=1);
    the applyInPandasWithState counters must accumulate ACROSS batches
    and the final state must equal the batch groupBy."""
    src = str(tmp_path_factory.mktemp("ev_multi"))
    load_table(spark, sf_dir, "events").repartition(4).write.mode("overwrite").parquet(src)

    stream = ev.read_events_stream(spark, f"{src}/*.parquet", max_files_per_trigger=1, nanos=False)
    q = (
        ev.user_lifetime_stats(stream)
        .writeStream.format("memory")
        .queryName("t_lifetime")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    n_batches = len([p for p in q.recentProgress if p["numInputRows"] > 0])
    assert n_batches >= 2  # state actually crossed microbatch boundaries

    got = {
        r["user_id"]: (r["n_events"], r["sum_value"], r["max_value"])
        for r in ev.final_user_stats(spark.table("t_lifetime")).collect()
    }
    want = {
        r["user_id"]: (r["n"], r["s"], r["m"])
        for r in batch_events.groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("s"),
            F.max("value").alias("m"),
        )
        .collect()
    }
    assert got == want


def test_parquet_sink_exactly_once_across_restart(spark, sf_dir, tmp_path_factory):
    """Kill the file-sink query mid-stream, restart from the same
    checkpoint, and the output must contain every event exactly once —
    the write-ahead log must not re-commit finished batches."""
    import time

    base = tmp_path_factory.mktemp("eo_sink")
    src, out, cp = str(base / "src"), str(base / "out"), str(base / "cp")
    events = load_table(spark, sf_dir, "events")
    events.repartition(8).write.parquet(src)
    n_total = events.count()

    stream = ev.read_events_stream(spark, f"{src}/*.parquet", max_files_per_trigger=1, nanos=False)
    q1 = ev.start_parquet_sink(stream, out, cp)
    # let a few microbatches commit, then kill mid-stream
    time.sleep(2.5)
    q1.stop()
    q1.awaitTermination()

    stream2 = ev.read_events_stream(spark, f"{src}/*.parquet", max_files_per_trigger=1, nanos=False)
    q2 = ev.start_parquet_sink(stream2, out, cp)
    q2.awaitTermination()

    got = spark.read.parquet(out)
    assert got.count() == n_total
    assert got.select("event_id").distinct().count() == n_total  # no dups, nothing lost


def test_stream_near_dedup_matches_batch_signature_set(spark, sf_dir):
    """Doubled document stream -> simhash-keyed dedup within watermark
    must land on exactly the batch signature set."""
    from langchain_memvid_spark.operators.dedup import simhash
    from langchain_memvid_spark.streaming import documents as sd

    d1 = sd.read_documents_stream(spark, f"{sf_dir}/documents.parquet")
    d2 = sd.read_documents_stream(spark, f"{sf_dir}/documents.parquet")
    got = ev.run_to_memory(
        sd.near_dedup_stream(d1.unionByName(d2)), "t_neardedup", mode="append",
        state_partitions=8,
    )
    batch = simhash(load_table(spark, sf_dir, "documents")).select("simhash").distinct()
    assert _sorted_rows(got, ["simhash"]) == _sorted_rows(batch, ["simhash"])


def test_stream_ingest_store_matches_batch_add_texts(spark, sf_dir, tmp_path_factory):
    """Streaming ingest through the exactly-once sink must produce rows
    column-identical to batch SparkVectorStore.add_texts on the same
    documents: same texts, same metadata hashes, same (normalized)
    embeddings, same int8 codes."""
    from langchain_memvid_spark import SparkVectorStore
    from langchain_memvid_spark.streaming import documents as sd

    base = tmp_path_factory.mktemp("ingest")
    streamed = sd.stream_ingest_store(
        spark,
        f"{sf_dir}/documents.parquet",
        str(base / "table"),
        str(base / "ckpt"),
    )

    docs = load_table(spark, sf_dir, "documents").orderBy("doc_id").collect()
    store = SparkVectorStore.from_texts(
        [r["text"] for r in docs],
        spark,
        metadatas=[{"lang": r["lang"], "source": r["source"]} for r in docs],
    )
    cols = ["doc_id", "text", "metadata_hash", "embedding", "qscale", "qvec"]
    got = _sorted_rows(streamed, cols)
    want = _sorted_rows(store.doc_index, cols)
    assert len(got) == len(docs)
    assert got == want


def test_stream_ingest_store_with_centroids_partitions_layout(spark, sf_dir, tmp_path_factory):
    """stream_ingest_store(centroids=...) composes the full document
    ingest (dedup -> embed -> codes) with in-stream IVF assignment:
    the sink is Hive-partitioned and each doc's cluster equals the
    batch assignment expression over its sunk embedding."""
    import os as _os

    from langchain_memvid_spark.core.ivf import nearest_centroid_col

    # centroids from the embedding space the docs actually land in:
    # embed a sample batch-side, mean per (doc_id % 4) group
    from langchain_memvid_spark.embeddings import HashEmbeddings
    from langchain_memvid_spark.operators.topk import label_centroids
    from langchain_memvid_spark.streaming import documents as sd

    emb = HashEmbeddings(64)
    docs = load_table(spark, sf_dir, "documents")
    sample = docs.withColumn("embedding", emb.udf()(F.col("text"))).withColumn(
        "label", (F.col("doc_id") % 4).cast("int")
    )
    cents = [
        (r["label"], [float(x) for x in r["centroid"]])
        for r in label_centroids(sample).collect()
    ]
    base = tmp_path_factory.mktemp("store_ivf")
    out = sd.stream_ingest_store(
        spark,
        f"{sf_dir}/documents.parquet",
        str(base / "table"),
        str(base / "ckpt"),
        centroids=cents,
    )
    dirs = [d for d in _os.listdir(base / "table") if d.startswith("cluster_id=")]
    assert len(dirs) >= 2
    want = out.withColumn(
        "expect", nearest_centroid_col(F.col("embedding"), cents)
    )
    mismatches = want.filter(F.col("cluster_id") != F.col("expect")).count()
    assert mismatches == 0 and out.count() == docs.select("text").distinct().count()


def test_stream_ingest_ivf_partitioned_and_batch_parity(spark, sf_dir, tmp_path_factory):
    """Streaming IVF ingest must (a) land a Hive cluster_id=N layout,
    (b) partition-prune a probe filter at the scan, and (c) assign every
    streamed vector the SAME cluster the batch assignment expression
    gives — streamed rows are first-class citizens of the pruned search
    path, not stragglers awaiting an index rebuild."""
    import os as _os

    from langchain_memvid_spark.core.ivf import nearest_centroid_col
    from langchain_memvid_spark.operators.topk import label_centroids
    from langchain_memvid_spark.streaming import documents as sd

    emb = load_table(spark, sf_dir, "embeddings")
    cents = [
        (r["label"], [float(x) for x in r["centroid"]])
        for r in label_centroids(emb).collect()
    ]
    base = tmp_path_factory.mktemp("ivf_stream")
    out = sd.stream_ingest_ivf(
        spark,
        f"{sf_dir}/embeddings.parquet",
        str(base / "table"),
        str(base / "ckpt"),
        cents,
    )
    # (a) physical Hive layout
    dirs = [d for d in _os.listdir(base / "table") if d.startswith("cluster_id=")]
    assert len(dirs) >= 2
    # (b) probe filter becomes PartitionFilters, not a data filter
    probe = out.filter(F.col("cluster_id").isin([cents[0][0]]))
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "cluster_id" in plan.split("PartitionFilters")[1][:120]
    # (c) streamed assignment == batch assignment expression
    batch = emb.withColumn(
        "cluster_id", nearest_centroid_col(F.col("embedding"), cents)
    )
    got = {r["vec_id"]: r["cluster_id"] for r in out.collect()}
    want = {r["vec_id"]: r["cluster_id"] for r in batch.collect()}
    assert got == want and len(got) == emb.count()


def test_attach_store_over_streamed_ivf_table(spark, sf_dir, tmp_path_factory):
    """The composition closer: stream documents through the
    exactly-once IVF-partitioned sink, then ATTACH a SparkVectorStore
    over the streamed table in place — full search surface, live
    partition-pruned path (PartitionFilters on cluster_id), results
    identical to a search over the raw table."""
    from langchain_memvid_spark import SparkVectorStore
    from langchain_memvid_spark.config import EngineConfig, IndexConfig
    from langchain_memvid_spark.embeddings import HashEmbeddings
    from langchain_memvid_spark.operators.topk import label_centroids
    from langchain_memvid_spark.streaming import documents as sd

    emb = HashEmbeddings(64)
    docs = load_table(spark, sf_dir, "documents")
    sample = docs.withColumn("embedding", emb.udf()(F.col("text"))).withColumn(
        "label", (F.col("doc_id") % 4).cast("int")
    )
    cents = [
        (r["label"], [float(x) for x in r["centroid"]])
        for r in label_centroids(sample).collect()
    ]
    base = tmp_path_factory.mktemp("attach_ivf")
    sd.stream_ingest_store(
        spark,
        f"{sf_dir}/documents.parquet",
        str(base / "table"),
        str(base / "ckpt"),
        centroids=cents,
    )

    cfg = EngineConfig(
        index=IndexConfig(metric="cosine", ivf=True, nlist=4, nprobe=4,
                          ivf_min_points_factor=5, rerank_candidates=0)
    )
    store = SparkVectorStore.attach(
        str(base / "table"), spark, embeddings=emb, config=cfg, centroids=cents
    )
    assert store.ivf_index is not None
    assert store.get_document_count() == docs.select("text").distinct().count()

    qtext = docs.orderBy("doc_id").head()["text"]
    res = store.similarity_search(qtext, k=3)
    assert res and res[0]["page_content"] == qtext
    qvec = store._query_vec(qtext)
    plan = store._topk(qvec, 3)._jdf.queryExecution().executedPlan().toString()
    line = next(l for l in plan.splitlines() if "PartitionFilters" in l)
    assert "cluster_id" in line.split("PartitionFilters")[1][:80]
    # partial probe: the self-match doc lives in its own nearest cluster
    store.config.index.nprobe = 1
    res1 = store.similarity_search(qtext, k=1)
    assert res1[0]["page_content"] == qtext


def test_stream_dedup_vs_corpus_suppresses_known_signatures(spark, sf_dir):
    """Stream-static anti join gate: signatures already in the corpus
    set never reach the output; the survivors are exactly the batch
    signature set minus the corpus set (in-stream dedup still holds on
    the doubled stream)."""
    from langchain_memvid_spark.operators.dedup import simhash
    from langchain_memvid_spark.streaming import documents as sd

    corpus_sigs = simhash(
        load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 3 == 0)
    ).select("simhash")
    d1 = sd.read_documents_stream(spark, f"{sf_dir}/documents.parquet")
    d2 = sd.read_documents_stream(spark, f"{sf_dir}/documents.parquet")
    got = ev.run_to_memory(
        sd.near_dedup_stream_vs_corpus(d1.unionByName(d2), corpus_sigs),
        "t_corpusdedup", mode="append", state_partitions=8,
    )
    batch_all = simhash(load_table(spark, sf_dir, "documents")).select("simhash").distinct()
    want = sorted(
        set(r["simhash"] for r in batch_all.collect())
        - set(r["simhash"] for r in corpus_sigs.collect())
    )
    assert sorted(r["simhash"] for r in got.collect()) == want


def test_stream_similarity_join_matches_batch(spark, sf_dir, tmp_path_factory):
    """Streamed retrieval (foreachBatch similarity_join, idempotent
    per-batch-partition sink) accumulates EXACTLY the batch
    similarity_join result over the same queries, and the output is
    Hive-partitioned by batch_id (the exactly-once unit)."""
    import os

    from langchain_memvid_spark.config import EngineConfig, IndexConfig
    from langchain_memvid_spark.core.store import SparkVectorStore
    from langchain_memvid_spark.streaming import documents as sd

    emb = load_table(spark, sf_dir, "embeddings")
    cfg = EngineConfig(
        index=IndexConfig(
            metric="ip", ivf=True, nlist=4, nprobe=4,
            ivf_min_points_factor=5, rerank_candidates=0,
        )
    )
    store = SparkVectorStore(spark, config=cfg)
    store.add_dataframe(
        emb.withColumn("__t", F.concat(F.lit("doc-"), F.col("vec_id"))),
        text_col="__t", order_col="vec_id", embedding_col="embedding",
    )
    base = tmp_path_factory.mktemp("stream_simjoin")
    out = sd.stream_similarity_join(
        spark,
        f"{sf_dir}/embeddings.parquet",
        f"{base}/results",
        f"{base}/ckpt",
        store,
        k=3,
    )
    got = {
        (r["query_id"], r["rank"]): r["doc_id"]
        for r in out.collect()
    }
    queries = emb.select(F.col("vec_id").alias("query_id"), "embedding")
    want = {
        (r["query_id"], r["rank"]): r["doc_id"]
        for r in store.similarity_join(queries, k=3).collect()
    }
    assert got == want
    assert any(
        d.startswith("batch_id=") for d in os.listdir(f"{base}/results")
    )
    # the partition-discovery column comes LAST — the empty-source path
    # must produce the same order (ADVICE r8)
    assert out.columns == [
        "query_id", "doc_id", "text", "similarity", "rank", "batch_id"
    ]


def test_stream_similarity_join_empty_source_returns_empty(spark, sf_dir, tmp_path_factory):
    """A fully-filtered (or empty) query stream produces ZERO
    microbatches, so no sink directory exists — the call must return
    an empty DataFrame with the documented schema instead of raising
    PATH_NOT_FOUND (ADVICE r7)."""
    from langchain_memvid_spark.config import EngineConfig, IndexConfig
    from langchain_memvid_spark.core.store import SparkVectorStore
    from langchain_memvid_spark.streaming import documents as sd

    emb = load_table(spark, sf_dir, "embeddings")
    store = SparkVectorStore(spark, config=EngineConfig(index=IndexConfig(dim=64)))
    store.add_dataframe(
        emb.withColumn("__t", F.concat(F.lit("doc-"), F.col("vec_id"))),
        text_col="__t", order_col="vec_id", embedding_col="embedding",
    )
    base = tmp_path_factory.mktemp("stream_simjoin_empty")
    out = sd.stream_similarity_join(
        spark,
        f"{sf_dir}/embeddings.parquet",
        f"{base}/results",
        f"{base}/ckpt",
        store,
        k=3,
        filter_expr="vec_id < 0",  # matches nothing
    )
    assert out.count() == 0
    # same COLUMN ORDER as the non-empty (partitioned-read) path, so
    # positional consumers see one schema on both (ADVICE r8)
    assert out.columns == [
        "query_id", "doc_id", "text", "similarity", "rank", "batch_id"
    ]


def test_stream_media_dedup_vs_corpus(spark, sf_dir, tmp_path_factory):
    """The streaming media ingest gate accumulates EXACTLY the batch
    incremental kernel's verdicts across microbatches (multi-file
    source, maxFilesPerTrigger=1), is Hive-partitioned by batch_id
    (the exactly-once unit), and returns a typed empty frame with
    batch_id LAST on an empty source."""
    import os

    from langchain_memvid_spark.multimodal import binary as mm
    from langchain_memvid_spark.streaming.media import stream_media_dedup_vs_corpus

    docs = load_table(spark, sf_dir, "documents").limit(90)
    corpus = mm.synthesize_image_corpus(docs, variant_every=None)
    corpus_sig = mm.dhash_images(corpus).localCheckpoint()
    batch = mm.synthesize_image_batch(docs, variant_every=7, novel_remainder=3)
    base = tmp_path_factory.mktemp("stream_media_gate")
    batch.repartition(3).write.parquet(f"{base}/arrivals")
    out = stream_media_dedup_vs_corpus(
        spark, f"{base}/arrivals", f"{base}/verdicts", f"{base}/ckpt",
        corpus_sig, modality="image", max_files_per_trigger=1,
    )
    got = sorted(
        (r["media_id"], r["is_dup"], r["dup_of"], r["decoded"])
        for r in out.collect()
    )
    want = sorted(
        map(tuple, mm.incremental_image_near_dup(batch, corpus_sig=corpus_sig).collect())
    )
    assert got == want
    batch_dirs = [d for d in os.listdir(f"{base}/verdicts") if d.startswith("batch_id=")]
    assert len(batch_dirs) == 3
    assert out.columns == ["media_id", "is_dup", "dup_of", "decoded", "batch_id"]

    # empty source: typed empty frame, batch_id LAST (ADVICE r8 rule)
    empty_dir = tmp_path_factory.mktemp("stream_media_empty")
    spark.createDataFrame(
        [], "media_id long, media_type string, content binary"
    ).write.parquet(f"{empty_dir}/arrivals")
    eout = stream_media_dedup_vs_corpus(
        spark, f"{empty_dir}/arrivals", f"{empty_dir}/verdicts",
        f"{empty_dir}/ckpt", corpus_sig, modality="image",
    )
    # an empty PARQUET source still triggers one microbatch with zero
    # rows, so either path (empty partition dir or typed fallback) must
    # present the same schema order
    assert eout.columns == ["media_id", "is_dup", "dup_of", "decoded", "batch_id"]
    assert eout.count() == 0

    import pytest as _pytest

    with _pytest.raises(ValueError, match="modality"):
        stream_media_dedup_vs_corpus(
            spark, f"{base}/arrivals", f"{base}/v2", f"{base}/c2",
            corpus_sig, modality="text",
        )


def test_stream_dedup_vs_corpus_strategy_pick(spark, sf_dir, monkeypatch):
    """The static side's broadcast is an exact-count PICK, not a
    blanket hint (VERDICT r7 What's-wrong #1): under the bound the
    analyzed plan carries the broadcast hint; above it (bound forced to
    0) the join runs unhinted — Spark plans the big static side like
    any other join input instead of pinning it into every executor."""
    from langchain_memvid_spark.operators import dedup as dd
    from langchain_memvid_spark.operators.dedup import simhash
    from langchain_memvid_spark.streaming import documents as sd

    corpus_sigs = simhash(
        load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 3 == 0)
    ).select("simhash")
    stream = sd.read_documents_stream(spark, f"{sf_dir}/documents.parquet")

    def analyzed(df):
        return df._jdf.queryExecution().analyzed().toString()

    hinted = sd.near_dedup_stream_vs_corpus(stream, corpus_sigs)
    assert "UnresolvedHint" in analyzed(hinted) or "ResolvedHint" in analyzed(hinted)

    monkeypatch.setattr(dd, "_PAIR_BROADCAST_ROW_LIMIT", 0)
    unhinted = sd.near_dedup_stream_vs_corpus(stream, corpus_sigs)
    plan = analyzed(unhinted)
    assert "UnresolvedHint" not in plan and "ResolvedHint" not in plan


def test_stream_media_gate_store_handle_pins_config(spark, tmp_path):
    """VERDICT r9 item 3: the TYPED gate construction — pass the
    MediaSignatureStore handle and the gate derives (modality,
    hash_bits, every_n) from the sidecar; kwargs that contradict the
    sidecar raise ConfigError instead of silently signing arrivals at
    a width the corpus table never used (null hamming ⇒ all-novel)."""
    from langchain_memvid_spark.exceptions import ConfigError
    from langchain_memvid_spark.multimodal import binary as mm
    from langchain_memvid_spark.multimodal.sigstore import MediaSignatureStore
    from langchain_memvid_spark.streaming.media import stream_media_dedup_vs_corpus

    w, h = 16, 8
    png = mm.encode_png(w, h, mm._stretch_bytes(b"gate", w * h))
    png2 = mm.encode_png(w, h, mm._stretch_bytes(b"new", w * h))
    store = MediaSignatureStore(spark, str(tmp_path / "sigs"), "image", hash_bits=256)
    store.sign_and_append(spark.createDataFrame(
        [(0, "image", png)], "media_id long, media_type string, content binary"))
    spark.createDataFrame(
        [(10, "image", png), (11, "image", png2)],
        "media_id long, media_type string, content binary",
    ).write.parquet(str(tmp_path / "arrivals"))

    # drift refusals: wrong width / wrong modality / wrong stride / both sources
    for bad in (
        dict(hash_bits=64),
        dict(modality="audio"),
        dict(every_n=2),
    ):
        with pytest.raises(ConfigError, match="contradicts"):
            stream_media_dedup_vs_corpus(
                spark, str(tmp_path / "arrivals"), str(tmp_path / "v0"),
                str(tmp_path / "c0"), store=store, **bad)
    with pytest.raises(ConfigError, match="not both"):
        stream_media_dedup_vs_corpus(
            spark, str(tmp_path / "arrivals"), str(tmp_path / "v0"),
            str(tmp_path / "c0"), corpus_sig=store.signatures(), store=store)
    with pytest.raises(ConfigError, match="corpus_sig"):
        stream_media_dedup_vs_corpus(
            spark, str(tmp_path / "arrivals"), str(tmp_path / "v0"),
            str(tmp_path / "c0"))

    # the typed path runs and the sidecar's 256-bit width is live:
    # verdicts match the batch kernel at the STORE's width
    out = stream_media_dedup_vs_corpus(
        spark, str(tmp_path / "arrivals"), str(tmp_path / "verdicts"),
        str(tmp_path / "ckpt"), store=store)
    rows = {r["media_id"]: r for r in out.collect()}
    assert rows[10]["is_dup"] and rows[10]["dup_of"] == 0
    assert not rows[11]["is_dup"]
    # matching explicit kwargs are ACCEPTED (redundant but consistent)
    out2 = stream_media_dedup_vs_corpus(
        spark, str(tmp_path / "arrivals"), str(tmp_path / "verdicts2"),
        str(tmp_path / "ckpt2"), store=store, hash_bits=256, modality="image")
    assert out2.count() == 2


def test_stream_video_contains_image(spark, sf_dir, tmp_path):
    """Streaming cross-modality gate: accumulated matches across
    microbatches equal the batch operator's on the union of arrivals
    (batch-split-invariant), Hive-partitioned by batch_id; empty
    source returns the typed frame with batch_id LAST; a non-image
    store raises."""
    from langchain_memvid_spark.exceptions import ConfigError
    from langchain_memvid_spark.multimodal import binary as mm
    from langchain_memvid_spark.multimodal.sigstore import MediaSignatureStore
    from langchain_memvid_spark.streaming.media import stream_video_contains_image

    docs = load_table(spark, sf_dir, "documents").limit(60)
    store = MediaSignatureStore(spark, str(tmp_path / "isigs"), "image")
    store.sign_and_append(mm.synthesize_image_corpus(docs, variant_every=None))
    videos = mm.synthesize_video_with_planted_images(docs, plant_every=5)
    videos.repartition(3).write.parquet(str(tmp_path / "arrivals"))
    out = stream_video_contains_image(
        spark, str(tmp_path / "arrivals"), str(tmp_path / "matches"),
        str(tmp_path / "ckpt"), image_sig=store, max_files_per_trigger=1)
    assert out.columns == ["video_id", "frame_no", "image_id", "hamming", "batch_id"]
    got = sorted((r["video_id"], r["frame_no"], r["image_id"], r["hamming"])
                 for r in out.collect())
    want = sorted(map(tuple, mm.video_contains_image_pairs(
        videos, image_sig=store.signatures()).collect()))
    assert got == want and len(got) == 12  # 60 docs / 5 planted

    # empty source: typed empty frame, batch_id last
    spark.createDataFrame([], "media_id long, media_type string, content binary"
                          ).write.parquet(str(tmp_path / "none"))
    eout = stream_video_contains_image(
        spark, str(tmp_path / "none"), str(tmp_path / "m2"),
        str(tmp_path / "c2"), image_sig=store)
    assert eout.columns == ["video_id", "frame_no", "image_id", "hamming", "batch_id"]
    assert eout.count() == 0

    astore = MediaSignatureStore(spark, str(tmp_path / "asigs"), "audio")
    with pytest.raises(ConfigError, match="image modality"):
        stream_video_contains_image(
            spark, str(tmp_path / "arrivals"), str(tmp_path / "m3"),
            str(tmp_path / "c3"), image_sig=astore)


def test_stream_video_shared_runs(spark, sf_dir, tmp_path):
    """Streaming shared-run gate (VERDICT r13 item 3): accumulated
    runs across microbatches equal the batch vs-corpus operator's on
    the union of arrivals (batch-split-invariant — arrivals are judged
    against the fixed corpus only), and match the overlap fixture's
    closed form; empty source returns the typed frame with batch_id
    LAST; a non-video store raises."""
    from langchain_memvid_spark.exceptions import ConfigError
    from langchain_memvid_spark.multimodal import binary as mm
    from langchain_memvid_spark.multimodal.sigstore import MediaSignatureStore
    from langchain_memvid_spark.streaming.media import stream_video_shared_runs

    docs = load_table(spark, sf_dir, "documents").limit(60)
    media = mm.synthesize_video_overlap_corpus(docs, overlap_every=5)
    bases = media.filter(F.col("media_id") < mm.VARIANT_ID_OFFSET)
    variants = media.filter(F.col("media_id") >= mm.VARIANT_ID_OFFSET)
    store = MediaSignatureStore(spark, str(tmp_path / "rsigs"), "video")
    store.sign_and_append(bases)
    variants.repartition(3).write.parquet(str(tmp_path / "arrivals"))
    out = stream_video_shared_runs(
        spark, str(tmp_path / "arrivals"), str(tmp_path / "matches"),
        str(tmp_path / "ckpt"), corpus_sig=store, max_files_per_trigger=1)
    assert out.columns == ["video_id", "corpus_id", "video_start",
                           "corpus_start", "run_frames",
                           "max_hamming_seen", "batch_id"]
    got = sorted((r["video_id"], r["corpus_id"], r["video_start"],
                  r["corpus_start"], r["run_frames"], r["max_hamming_seen"])
                 for r in out.collect())
    want = sorted(map(tuple, mm.video_shared_runs_vs_corpus(
        variants, corpus_sig=store.signatures()).collect()))
    assert got == want
    # the overlap fixture's closed form: every 5th doc's variant
    # shares frames o..o+L-1 (o=d%2, L=2+d%2) behind p=1+d%3 prefix
    assert got == sorted(
        (d + mm.VARIANT_ID_OFFSET, d, 1 + d % 3, d % 2, 2 + d % 2, 0)
        for d in range(0, 60, 5))

    # empty source: typed empty frame, batch_id last
    spark.createDataFrame([], "media_id long, media_type string, content binary"
                          ).write.parquet(str(tmp_path / "none"))
    eout = stream_video_shared_runs(
        spark, str(tmp_path / "none"), str(tmp_path / "m2"),
        str(tmp_path / "c2"), corpus_sig=store)
    assert eout.columns == ["video_id", "corpus_id", "video_start",
                            "corpus_start", "run_frames",
                            "max_hamming_seen", "batch_id"]
    assert eout.count() == 0

    astore = MediaSignatureStore(spark, str(tmp_path / "asigs"), "audio")
    with pytest.raises(ConfigError, match="video modality"):
        stream_video_shared_runs(
            spark, str(tmp_path / "arrivals"), str(tmp_path / "m3"),
            str(tmp_path / "c3"), corpus_sig=astore)


def test_stream_video_audio_contains_clip(spark, sf_dir, tmp_path):
    """Streaming SOUNDTRACK gate (VERDICT r12 item 3's production
    form): accumulated matches across microbatches equal the batch
    operator's on the union of arrivals (batch-split-invariant),
    Hive-partitioned by batch_id; empty source returns the typed
    frame with batch_id LAST; a whole-clip-grain store handle raises
    with the span-grain pointer."""
    from langchain_memvid_spark.exceptions import ConfigError
    from langchain_memvid_spark.multimodal import binary as mm
    from langchain_memvid_spark.multimodal.sigstore import MediaSignatureStore
    from langchain_memvid_spark.streaming.media import (
        stream_video_audio_contains_clip,
    )

    docs = load_table(spark, sf_dir, "documents").limit(60)
    media = mm.synthesize_video_with_soundtrack(docs, clip_every=5,
                                                span_samples=256)
    mm.envelope_hash_audio_spans(media, span_samples=256).write.parquet(
        str(tmp_path / "clip_spans"))
    clip_sig = spark.read.parquet(str(tmp_path / "clip_spans"))
    videos = media.filter(F.col("media_type") == "video")
    videos.repartition(3).write.parquet(str(tmp_path / "arrivals"))
    out = stream_video_audio_contains_clip(
        spark, str(tmp_path / "arrivals"), str(tmp_path / "matches"),
        str(tmp_path / "ckpt"), clip_sig=clip_sig, span_samples=256,
        max_files_per_trigger=1)
    assert out.columns == ["video_id", "clip_id", "offset", "clip_frames",
                           "max_hamming_seen", "batch_id"]
    got = sorted((r["video_id"], r["clip_id"], r["offset"],
                  r["clip_frames"], r["max_hamming_seen"])
                 for r in out.collect())
    want = sorted(map(tuple, mm.video_audio_contains_clip_vs_corpus(
        videos, clip_sig=clip_sig, span_samples=256).collect()))
    assert got == want and len(got) == 12  # 60 docs / 5 planted

    # empty source: typed empty frame, batch_id last
    spark.createDataFrame([], "media_id long, media_type string, content binary"
                          ).write.parquet(str(tmp_path / "none"))
    eout = stream_video_audio_contains_clip(
        spark, str(tmp_path / "none"), str(tmp_path / "m2"),
        str(tmp_path / "c2"), clip_sig=clip_sig, span_samples=256)
    assert eout.columns == ["video_id", "clip_id", "offset", "clip_frames",
                            "max_hamming_seen", "batch_id"]
    assert eout.count() == 0

    astore = MediaSignatureStore(spark, str(tmp_path / "asigs"), "audio")
    with pytest.raises(ConfigError, match="audio_span modality"):
        stream_video_audio_contains_clip(
            spark, str(tmp_path / "arrivals"), str(tmp_path / "m3"),
            str(tmp_path / "c3"), clip_sig=astore)

    # TYPED form: an audio_span store pins the span layout; the gate
    # adopts it and a contradicting kwarg raises
    sstore = MediaSignatureStore(
        spark, str(tmp_path / "spanstore"), "audio_span", span_samples=256)
    sstore.sign_and_append(media)
    tout = stream_video_audio_contains_clip(
        spark, str(tmp_path / "arrivals"), str(tmp_path / "m4"),
        str(tmp_path / "c4"), clip_sig=sstore, max_files_per_trigger=1)
    tgot = sorted((r["video_id"], r["clip_id"], r["offset"],
                   r["clip_frames"], r["max_hamming_seen"])
                  for r in tout.collect())
    assert tgot == got
    with pytest.raises(ConfigError, match="contradicts"):
        stream_video_audio_contains_clip(
            spark, str(tmp_path / "arrivals"), str(tmp_path / "m5"),
            str(tmp_path / "c5"), clip_sig=sstore, span_samples=512)
