"""Engine exception taxonomy.

Mirrors the reference's error surface (MemVidError + 5 subclasses,
/root/reference/src/langchain_memvid/exceptions.py:6-27) so users of
the reference find the same failure categories here.
"""


class MemVidSparkError(Exception):
    """Base class for all engine errors."""


class EncodingError(MemVidSparkError):
    """Raised when payload serialization / ingest fails."""


class RetrievalError(MemVidSparkError):
    """Raised when a search or point lookup fails."""


class IndexError_(MemVidSparkError):
    """Raised on index-table maintenance failures (add/delete/load)."""


class StorageError(MemVidSparkError):
    """Raised on table read/write failures."""


class ConfigError(MemVidSparkError):
    """Raised on invalid engine configuration."""


class FilterError(MemVidSparkError):
    """Raised on an invalid metadata-filter expression (engine
    extension — the reference has no filtered search)."""
