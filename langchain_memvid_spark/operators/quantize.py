"""Embedding quantization: float32 → int8 storage with per-vector
scales.

At 100 TB the embedding column dominates storage and scan bytes; 8-bit
symmetric quantization cuts both 4× while keeping retrieval quality
(recon cosine ≥ 0.999 on unit-normalized vectors). Entirely Catalyst
HOFs — the arithmetic is fixed-order IEEE double plus an exact
``floor(x + 0.5)`` (no round()-mode ambiguity between engines), so the
DuckDB oracle reproduces every quantized value bit-for-bit.

Reference analog: FAISS stores float32 flat
(/root/reference/src/langchain_memvid/index.py:144-148); scalar
quantization is the standard scale path FAISS offers as SQ8.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from langchain_memvid_spark.functions.vector import cosine_sim


def _scale(v: Column) -> Column:
    return F.greatest(
        F.array_max(F.transform(v, lambda x: F.abs(x.cast("double")))), F.lit(1e-30)
    )


def quantize_cols(v: Column) -> tuple[Column, Column]:
    """(scale, qvec array<tinyint>) column pair for an embedding column —
    the building block SparkVectorStore / IVFIndex use to persist codes
    alongside the float vectors at ingest."""
    scale = _scale(v)
    qvec = F.transform(
        v, lambda x: F.floor(x.cast("double") / scale * 127 + F.lit(0.5)).cast("tinyint")
    )
    return scale, qvec


def query_codes(qvec: list[float]) -> list[int]:
    """Driver-side int8 codes for a query vector — the same
    floor(x/scale·127 + 0.5) arithmetic as quantize_cols, kept in ONE
    place so the store/IVF two-phase paths can never drift from the
    stored codes or the DuckDB oracle."""
    import math

    s = max((abs(x) for x in qvec), default=0.0) or 1e-30
    return [int(math.floor(x / s * 127 + 0.5)) for x in qvec]


def int8_dot(qvec: Column, query_codes: Column) -> Column:
    """Exact int64 dot product of two int8 code arrays (JVM HOFs)."""
    return F.aggregate(
        F.zip_with(qvec, query_codes, lambda a, b: a.cast("long") * b.cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def quantize_embeddings(
    embeddings: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(id, scale, qvec array<tinyint>) — symmetric int8 with a
    per-vector scale. q_i = floor(x_i / scale * 127 + 0.5) ∈
    [-127, 127], stored as ByteType so the physical column really is
    one byte per code (the 4× storage/scan-bytes claim, realized)."""
    v = F.col(vec_col)
    scale = _scale(v)
    qvec = F.transform(
        v, lambda x: F.floor(x.cast("double") / scale * 127 + F.lit(0.5)).cast("tinyint")
    )
    return embeddings.select(
        F.col(id_col), scale.alias("scale"), qvec.alias("qvec")
    )


def knn_topk_quantized(
    embeddings: DataFrame,
    query_vec_id: int = 0,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k by integer dot product over the int8 codes — search that
    never touches the float column (the compressed-domain symmetric
    distance). Scoring is exact int64 arithmetic, so ordering is fully
    deterministic across engines and the oracle needs no float
    tolerance at all. Per-vector scales mean the integer score is a
    scaled cosine surrogate; ranking quality is bounded by the
    quantization error measured in quantization_report.

    Plan shape mirrors knn_topk: broadcast the single query code row,
    JVM-side HOF scoring, TakeOrderedAndProject top-k (per-partition
    heaps, no global sort)."""
    q = quantize_embeddings(embeddings, id_col, vec_col)
    qrow = q.filter(F.col(id_col) == query_vec_id).select(
        F.col("qvec").alias("__qq")
    )
    scored = q.crossJoin(F.broadcast(qrow)).withColumn(
        "qscore", int8_dot(F.col("qvec"), F.col("__qq"))
    )
    return (
        scored.orderBy(F.col("qscore").desc(), F.col(id_col).asc())
        .limit(k)
        .select(id_col, "qscore")
    )


def knn_topk_requantized(
    embeddings: DataFrame,
    query_vec_id: int = 0,
    k: int = 10,
    candidates: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Two-phase search: compressed-domain first pass → exact re-rank.

    Phase 1 scores int8 codes with exact int64 arithmetic and keeps the
    top-`candidates` rows ranked by qscore·scale (codes are x/scale·127,
    so the raw integer dot is ∝ dot(a,q)/scale_a — multiplying back by
    the per-vector scale removes the systematic under-ranking of
    large-max-component vectors; the int64·double product is exact and
    identical across engines, tie-broken by id, so the candidate cut is
    still deterministic). Phase 2 joins ONLY those candidates back to
    the float column and re-ranks them by true cosine.

    This is the 100 TB shape: the first pass reads 1-byte codes (4×
    fewer scan bytes than float32), the expensive float math touches
    `candidates` rows instead of the corpus. SparkVectorStore and
    IVFIndex store the codes at ingest so phase 1 never materializes
    them (core/store.py, core/ivf.py); here they are derived in-plan so
    the operator works on any embeddings table.

    Reference analog: FAISS SQ8 + refine (the reference stores flat
    float32, index.py:144-148 — this beats its scan bytes 4×).
    """
    from langchain_memvid_spark.functions.vector import cosine_sim

    q = quantize_embeddings(embeddings, id_col, vec_col)
    qrow = q.filter(F.col(id_col) == query_vec_id).select(F.col("qvec").alias("__qq"))
    first_pass = (
        q.crossJoin(F.broadcast(qrow))
        .withColumn("qscore", int8_dot(F.col("qvec"), F.col("__qq")))
        .orderBy(
            (F.col("qscore").cast("double") * F.col("scale")).desc(),
            F.col(id_col).asc(),
        )
        .limit(candidates)
        .select(id_col, "qscore")
    )
    fqrow = embeddings.filter(F.col(id_col) == query_vec_id).select(
        F.col(vec_col).alias("__fq")
    )
    return (
        embeddings.join(F.broadcast(first_pass), id_col)
        .crossJoin(F.broadcast(fqrow))
        .withColumn("sim", F.round(cosine_sim(F.col(vec_col), F.col("__fq")), 4))
        .orderBy(F.col("sim").desc(), F.col(id_col).asc())
        .limit(k)
        .select(id_col, "qscore", "sim")
    )


def quantization_report(
    embeddings: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Per-vector quantization quality: the scale, the L1 mass of the
    int8 codes (an exact integer the oracle can hash), and the cosine
    between the original and its dequantized reconstruction."""
    v = F.col(vec_col)
    scale = _scale(v)
    qvec = F.transform(
        v, lambda x: F.floor(x.cast("double") / scale * 127 + F.lit(0.5)).cast("long")
    )
    dequant = F.transform(qvec, lambda q: q.cast("double") * scale / 127)
    q_l1 = F.aggregate(
        F.transform(qvec, F.abs), F.lit(0).cast("long"), lambda acc, x: acc + x
    )
    return embeddings.select(
        F.col(id_col),
        F.round(scale, 4).alias("scale"),
        q_l1.alias("q_l1"),
        F.round(cosine_sim(v, dequant), 4).alias("recon_cos"),
    )
