from langchain_memvid_spark.core.store import SparkVectorStore, SearchResult
from langchain_memvid_spark.core.ids import add_sequential_ids

__all__ = ["SparkVectorStore", "SearchResult", "add_sequential_ids"]
