"""langchain_memvid_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of sarumaj/langchain-memvid.

The reference (read-only at /root/reference) is a LangChain VectorStore
that stores chunks twice: essential metadata + vectors in FAISS, and the
full JSON payload as QR-coded video frames. This engine re-expresses
that design Spark-first as two Parquet tables:

  - ``doc_index``  (doc_id, text, source, category, metadata_hash,
                    embedding array<float>)        ≙ FAISS + metadata.json
  - ``payload``    (doc_id, payload_json)          ≙ the QR/MP4 archive

plus the large-scale pipeline operators (dedup, ANN search, text
analysis, streaming) a 100 TB training-data pipeline needs.

All query logic is declarative DataFrame/SQL so Catalyst handles
pushdown, pruning, join strategy, and AQE at cluster scale.
"""

from langchain_memvid_spark.config import EngineConfig, IndexConfig, StorageConfig
from langchain_memvid_spark.exceptions import (
    MemVidSparkError,
    EncodingError,
    RetrievalError,
    IndexError_,
    StorageError,
    ConfigError,
    FilterError,
)
from langchain_memvid_spark.embeddings import HashEmbeddings
from langchain_memvid_spark.core.store import SparkVectorStore, StorageStats
from langchain_memvid_spark.core.retriever import Document, SparkRetriever
from langchain_memvid_spark.types import BuildStats, FrameMappingStats, VideoInfo

__version__ = "0.1.0"

__all__ = [
    "EngineConfig",
    "IndexConfig",
    "StorageConfig",
    "MemVidSparkError",
    "EncodingError",
    "RetrievalError",
    "IndexError_",
    "StorageError",
    "ConfigError",
    "FilterError",
    "HashEmbeddings",
    "SparkVectorStore",
    "SparkRetriever",
    "Document",
    "StorageStats",
    "BuildStats",
    "FrameMappingStats",
    "VideoInfo",
]
