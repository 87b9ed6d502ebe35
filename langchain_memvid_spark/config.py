"""Engine configuration.

Mirrors the reference's pydantic config tree
(/root/reference/src/langchain_memvid/config.py:137-160 —
VectorStoreConfig{video, qrcode, index}) as plain dataclasses: the
video codec knob becomes the Parquet compression codec, the QR options
become payload-serialization options, and the index options become the
vector-index layout (metric, IVF nlist/nprobe analog).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from langchain_memvid_spark.exceptions import ConfigError

_VALID_METRICS = ("cosine", "ip", "l2")
_VALID_CODECS = ("snappy", "zstd", "gzip", "lz4", "none", "uncompressed")


@dataclass
class IndexConfig:
    """Vector-index layout. Reference analog: IndexConfig
    (/root/reference/src/langchain_memvid/config.py:111-134)."""

    metric: str = "cosine"          # cosine | ip | l2
    dim: int = 64
    # Opt-in IVF layout for the STORE's own search path: once the
    # corpus passes the 30*nlist training gate, add_texts assigns every
    # row a cluster_id (pure-Catalyst nearest-centroid argmax), the
    # corpus is persisted partitionBy(cluster_id), and _topk prunes to
    # the nprobe probed clusters BEFORE the int8 first pass — at 100 TB
    # the user-facing similarity_search scans nprobe/nlist of the files
    # instead of all of them. False keeps the flat (full-scan) layout.
    ivf: bool = False
    nlist: int = 100                # IVF cluster count (KMeans analog)
    nprobe: int = 8                 # clusters probed at search time
    # IVF is only worth it past this many points per cluster on average
    # (reference gates on 30*nlist, index.py:152-162).
    ivf_min_points_factor: int = 30
    # Two-phase search: int8 compressed-domain first pass keeps this
    # many candidates for the exact float re-rank. 0 disables the
    # compressed path entirely; below this corpus size the direct exact
    # scan is already cheaper than two passes. (FAISS SQ8+refine analog;
    # the reference scans flat float32, index.py:144-148.)
    rerank_candidates: int = 4096
    # Opt-in NEAR-dup ingest gate (the reference dedups exact text
    # only, index.py:202-218): in addition to the exact anti-join,
    # drop batch docs whose MinHash-estimated Jaccard vs any EXISTING
    # corpus doc is >= near_dedup_threshold. Signatures persist as
    # mh0..mh7 columns on doc_index at ingest (like the int8 codes),
    # so no batch ever re-signs the corpus. Within-batch near-dups are
    # NOT gated (only exact first-occurrence applies there) — run
    # operators/dedup batch-side if that matters upstream.
    near_dedup: bool = False
    near_dedup_threshold: float = 0.5

    def __post_init__(self) -> None:
        if self.metric not in _VALID_METRICS:
            raise ConfigError(f"metric must be one of {_VALID_METRICS}, got {self.metric!r}")
        if self.dim <= 0:
            raise ConfigError(f"dim must be positive, got {self.dim}")
        if self.nlist <= 0 or self.nprobe <= 0:
            raise ConfigError("nlist and nprobe must be positive")
        if self.rerank_candidates < 0:
            raise ConfigError("rerank_candidates must be >= 0")
        if not 0.0 < self.near_dedup_threshold <= 1.0:
            raise ConfigError(
                f"near_dedup_threshold must be in (0, 1], got {self.near_dedup_threshold}"
            )


@dataclass
class StorageConfig:
    """Table storage options. Reference analog: VideoConfig codec
    selection (/root/reference/src/langchain_memvid/config.py:68-77) —
    the video codec is our Parquet compression codec."""

    codec: str = "zstd"
    base_path: str = ""             # root dir for doc_index/payload tables
    shuffle_partitions: int = 32

    def __post_init__(self) -> None:
        if self.codec not in _VALID_CODECS:
            raise ConfigError(f"codec must be one of {_VALID_CODECS}, got {self.codec!r}")


@dataclass
class EngineConfig:
    """Top-level config tree (≙ VectorStoreConfig,
    /root/reference/src/langchain_memvid/config.py:137-160)."""

    index: IndexConfig = field(default_factory=IndexConfig)
    storage: StorageConfig = field(default_factory=StorageConfig)
