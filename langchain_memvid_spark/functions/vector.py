"""Vector math as JVM-side higher-order functions — no Python UDFs.

The reference computes these in FAISS C++ (inner product / L2 search,
/root/reference/src/langchain_memvid/index.py:144-148,327; L2
normalization :293-295,323-324). Here they are Catalyst expressions
(`zip_with` + `aggregate`), so scoring stays inside whole-stage
codegen and scales with executor count — no Arrow hop per row.

All arithmetic is done in DOUBLE regardless of the stored float32 so
results are stable and match the DuckDB oracle (which also upcasts).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Inner product <a,b> in double precision."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def l2_normalize(a: Column) -> Column:
    """Unit-normalize (float32 output to mirror the stored layout).

    Reference analog: faiss.normalize_L2 at ingest/query
    (/root/reference/src/langchain_memvid/index.py:293-295)."""
    n = norm(a)
    return F.when(n > 0, F.transform(a, lambda x: (x.cast("double") / n).cast("float"))).otherwise(a)


def cosine_sim(a: Column, b: Column) -> Column:
    """Cosine similarity; if inputs are pre-normalized this equals dot()."""
    return dot(a, b) / (norm(a) * norm(b))


def l2_sq(a: Column, b: Column) -> Column:
    """Squared L2 distance (FAISS IndexFlatL2 convention: lower=better,
    /root/reference/src/langchain_memvid/index.py:148,327)."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
