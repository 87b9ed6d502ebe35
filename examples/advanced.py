"""Advanced usage — mirrors the reference's examples/advanced.py
(/root/reference/examples/advanced.py): the lower-level components the
quickstart hides. Config tree, direct search_text, the archival codec
round-trip (the reference encodes QR frames into a video; this engine
encodes payload JSON into parquet and ships a REAL AVI/PNG container
codec for media columns), the retriever facade, IVF layout, and
save/load.

Run: python examples/advanced.py
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from langchain_memvid_spark import SparkVectorStore
from langchain_memvid_spark.config import EngineConfig, IndexConfig, StorageConfig
from langchain_memvid_spark.core.retriever import SparkRetriever
from langchain_memvid_spark.multimodal import binary as mm
from langchain_memvid_spark.session import get_spark

texts = [
    "The quick brown fox jumps over the lazy dog",
    "A fast orange fox leaps across a sleepy canine",
    "The weather is beautiful today",
    "It's raining cats and dogs outside",
    "Python is a popular programming language",
    "JavaScript is widely used for web development",
]
metadata = [
    {"id": 0, "source": "example1.txt", "category": "animals"},
    {"id": 1, "source": "example1.txt", "category": "animals"},
    {"id": 2, "source": "example2.txt", "category": "weather"},
    {"id": 3, "source": "example2.txt", "category": "weather"},
    {"id": 4, "source": "example3.txt", "category": "programming"},
    {"id": 5, "source": "example3.txt", "category": "programming"},
]


def main() -> None:
    spark = get_spark("advanced", shuffle_partitions=8)

    # config tree ≙ VectorStoreConfig{index, video} (reference
    # config.py:137-160): metric/IVF knobs + storage codec knob
    cfg = EngineConfig(
        index=IndexConfig(metric="cosine", dim=64, nlist=6, rerank_candidates=4),
        storage=StorageConfig(codec="zstd"),
    )
    vs = SparkVectorStore.from_texts(texts, spark, metadatas=metadata, config=cfg)

    # direct search_text ≙ IndexManager.search_text (SearchResult rows)
    for query in ["Tell me about foxes", "What's the weather like?"]:
        print(f"\n== search_text: {query}")
        for r in vs.search_text(query, k=2):
            print(f"  {r.similarity:8.4f}  {r.text}  [{r.category}]")

    # archival codec round-trip ≙ create_qr_code → encode_video →
    # decode_video → extract_qr_codes: here a real AVI container of
    # PNG frames, encoded and chunk-walk decoded from actual bytes
    frames = [mm.encode_png(16, 8, mm._stretch_bytes(t.encode(), 16 * 8)) for t in texts]
    avi = mm.encode_avi(16, 8, frames, fps=30)
    info = mm.parse_avi_info(avi)
    print(f"\nAVI round-trip: {info['n_frames']} frames, "
          f"{info['width']}x{info['height']} @ {info['fps']} fps, {len(avi)} bytes")

    # retriever facade ≙ Retriever(video_file, index_dir, k=2)
    retriever = SparkRetriever(vs, k=2)
    docs = retriever.batch(["Tell me about foxes", "What programming languages are mentioned?"])
    print(f"\nretriever.batch: {[len(d) for d in docs]} results per query")

    # save / load ≙ IndexManager.save/load (parquet instead of faiss+json)
    path = tempfile.mkdtemp(prefix="advanced_store_")
    vs.save(path)
    vs2 = SparkVectorStore.load(path, spark, config=cfg)
    print(f"reloaded store: {vs2.get_document_count()} docs from {path}")

    # hybrid retrieval (beyond the reference's pure-vector search):
    # lexical BM25 over the text column fused with the vector ranking
    # by reciprocal rank fusion — one bounded full-outer join
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from langchain_memvid_spark.operators.ranking import bm25_topk, rrf_fuse
    from langchain_memvid_spark.operators.topk import knn_topk

    docs_df = vs._doc_index.select("doc_id", "text")
    text_ranked = bm25_topk(docs_df, query_terms=("fox", "lazy"), k=4)
    vec_ranked = (
        knn_topk(  # "like doc 0" — the fox sentence — as the vector query
            vs._doc_index.select(F.col("doc_id").alias("vec_id"), "embedding"),
            k=4,
        )
        .withColumn(
            "rank",
            F.row_number()
            .over(Window.orderBy(F.col("sim").desc(), F.col("vec_id").asc()))
            .cast("int"),
        )
        .withColumnRenamed("vec_id", "doc_id")
    )
    print("\nhybrid BM25 ∪ vector (RRF):")
    rrf_fuse(text_ranked, vec_ranked, k=3).show(truncate=False)

    # MMR re-ranking + by-vector entry point (LangChain-standard,
    # beyond the reference): diversity-aware top-k, and search with a
    # precomputed query vector (skips the embed step)
    mmr = vs.max_marginal_relevance_search("quick animals", k=2, fetch_k=6)
    print(f"\nMMR picks: {[d['doc_id'] for d in mmr]}")
    qv = vs.embeddings.embed_query("quick animals")
    by_vec = vs.similarity_search_by_vector(qv, k=2)
    print(f"by-vector picks: {[d['doc_id'] for d in by_vec]}")

    # IVF layout in the STORE itself (round 7): opt in with
    # IndexConfig(ivf=True) and bulk-load a pre-embedded DataFrame —
    # once the corpus passes the 30*nlist gate the store trains
    # KMeans, persists the corpus partitionBy(cluster_id), and every
    # similarity search scans only the nprobe probed clusters
    # (file-level partition pruning: the 100 TB search path).
    emb_table = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    ivf_cfg = EngineConfig(
        index=IndexConfig(
            metric="ip", ivf=True, nlist=4, nprobe=2,
            ivf_min_points_factor=5, rerank_candidates=0,
        )
    )
    ivf_vs = SparkVectorStore(spark, config=ivf_cfg)
    n = ivf_vs.add_dataframe(
        emb_table.withColumn("t", F.concat(F.lit("vec-"), F.col("vec_id"))),
        text_col="t", order_col="vec_id", embedding_col="embedding",
    )
    qv0 = [float(x) for x in emb_table.filter(F.col("vec_id") == 0).head()["embedding"]]
    pruned = ivf_vs.similarity_search_by_vector(qv0, k=3)
    print(
        f"\nIVF store: {n} rows, {len(ivf_vs.ivf_index.centroids)} clusters, "
        f"nprobe=2 picks: {[d['doc_id'] for d in pruned]}"
    )

    # semantic dedup (SemDeDup, late r7): cluster-gated embedding
    # near-dup pairs — candidates come from an equi-join on the
    # KMeans cluster assignment (top-3 multi-probe), never all pairs;
    # every returned pair is exact-verified at the cosine threshold.
    from langchain_memvid_spark.operators.dedup import semantic_dedup_pairs

    pairs = semantic_dedup_pairs(emb_table, nlist=8, probes=3, threshold=0.4)
    print(f"semantic near-dup pairs (cluster-gated, exact-scored): {pairs.count()}")

    # stats surface (late r7): the reference's StorageStats/BuildStats
    # field names, computed from REAL bytes instead of its estimates
    st = vs.get_storage_stats()
    bs = vs.last_build_stats
    print(
        f"stats: {st.total_documents} docs, index {st.index_size_mb:.3f} MB, "
        f"payload {st.video_file_size_mb:.3f} MB, "
        f"redundancy {st.redundancy_percentage:.0f}%, "
        f"last batch {bs.total_chunks} chunks in {bs.encoding_time}s"
    )

    # tabular rendering ≙ the reference's %%as_table notebook magic
    # (ext.py:531) — engine-side the equivalent is one createDataFrame
    # + show(): search results are plain rows, so any Spark sink or
    # display surface renders them without a bespoke magic.
    spark.createDataFrame(
        [(r.text, float(r.similarity), r.category) for r in vs.search_text("foxes", k=3)],
        "text STRING, similarity DOUBLE, category STRING",
    ).show(truncate=40)


if __name__ == "__main__":
    main()
