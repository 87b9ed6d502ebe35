"""Deterministic, engine-portable hashing.

``stable_hash64`` produces the SAME value in Spark and in DuckDB
(oracle side uses ``('0x' || substring(sha256(s),1,15))::BIGINT``),
which makes minhash/simhash signatures oracle-checkable. 15 hex chars
= 60 bits, always positive in a signed 64-bit long.

``metadata_hash`` mirrors the reference's essential-metadata hash —
sha256 over a canonicalized metadata representation
(/root/reference/src/langchain_memvid/index.py:225-226 hashes
``str(sorted(metadata.items()))``; we canonicalize via sorted JSON so
the SQL oracle can reproduce it).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HASH_HEX_CHARS = 15  # 60 bits, fits signed BIGINT


def stable_hash64(c: Column, salt: str = "") -> Column:
    s = F.concat(F.lit(salt), c.cast("string")) if salt else c.cast("string")
    return F.conv(F.substring(F.sha2(s, 256), 1, HASH_HEX_CHARS), 16, 10).cast("long")


def stable_hash64_sql(expr: str, salt: str = "") -> str:
    """DuckDB-side equivalent of stable_hash64 (for oracle strings)."""
    inner = f"concat('{salt}', CAST({expr} AS VARCHAR))" if salt else f"CAST({expr} AS VARCHAR)"
    return f"('0x' || substring(sha256({inner}), 1, {HASH_HEX_CHARS}))::BIGINT"


def metadata_hash(meta_json: Column) -> Column:
    """sha256 of the canonical metadata JSON string."""
    return F.sha2(meta_json, 256)
