"""Quickstart — mirrors the reference's examples/quickstart.py
(/root/reference/examples/quickstart.py:30-80) on the Spark engine:
same texts, same metadata, same search → delete → re-search flow.
A reference user swaps HuggingFaceEmbeddings for any embedder with
embed_documents/embed_query (HashEmbeddings here keeps the example
dependency-free and deterministic).

Run: python examples/quickstart.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from langchain_memvid_spark import SparkVectorStore
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
    spark = get_spark("quickstart", shuffle_partitions=8)
    vs = SparkVectorStore.from_texts(texts, spark, metadatas=metadata)

    queries = [
        "Tell me about foxes",
        "What's the weather like?",
        "What programming languages are mentioned?",
    ]
    for query in queries:
        print(f"\n== {query}")
        for doc in vs.similarity_search(query, k=2, include_full_metadata=True):
            print(f"  {doc['page_content']}  [{doc['metadata'].get('category')}]")

    # normalized relevance + MMR (beyond the reference's raw scores)
    print("\n== relevance scores")
    for doc, score in vs.similarity_search_with_relevance_scores(queries[0], k=2):
        print(f"  {score:.3f}  {doc['page_content']}")
    print("\n== MMR (diverse top-3)")
    for doc in vs.max_marginal_relevance_search(queries[0], k=3, fetch_k=6):
        print(f"  {doc['page_content']}")

    # delete + renumber (ids reassigned 0..n-1, reference semantics)
    vs.delete_by_texts(["The weather is beautiful today"])
    print(f"\nafter delete: {vs.get_document_count()} docs, "
          f"ids {[d['doc_id'] for d in vs.get_all_documents()]}")

    stats = vs.get_storage_stats()
    print(f"storage: {stats.document_count} docs, index {stats.index_bytes} B, "
          f"payload {stats.payload_bytes} B")


if __name__ == "__main__":
    main()
