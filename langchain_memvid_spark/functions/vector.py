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


def relevance_score_col(score: Column, metric: str) -> Column:
    """LangChain-normalized relevance in [0, 1] as a Catalyst
    expression — THE single source for the metric maps: the store API
    (similarity_search_with_relevance_scores computes it in-plan) and
    the vs_relevance_scores oracle query both build from here, so the
    driver hash pins the exact map the API returns (ADVICE r4 #4 — ip
    maps via a sigmoid, not the affine cosine map, because the
    unnormalized dot is unbounded).

    cosine → (1+s)/2 clamped (float32 self-matches can exceed |1| by
    ~1e-7); l2 (squared distance, lower=better) → 1/(1+d²);
    ip → 1/(1+e^(−s))."""
    if metric == "l2":
        return F.lit(1.0) / (F.lit(1.0) + score)
    if metric == "ip":
        return F.lit(1.0) / (F.lit(1.0) + F.exp(-score))
    return F.least(
        F.lit(1.0), F.greatest(F.lit(0.0), (F.lit(1.0) + score) / F.lit(2.0))
    )


def l2_sq(a: Column, b: Column) -> Column:
    """Squared L2 distance (FAISS IndexFlatL2 convention: lower=better,
    /root/reference/src/langchain_memvid/index.py:148,327)."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
