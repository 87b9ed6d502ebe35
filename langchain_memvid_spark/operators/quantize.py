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
        "qscore",
        F.aggregate(
            F.zip_with(
                F.col("qvec"), F.col("__qq"), lambda a, b: a.cast("long") * b.cast("long")
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ),
    )
    return (
        scored.orderBy(F.col("qscore").desc(), F.col(id_col).asc())
        .limit(k)
        .select(id_col, "qscore")
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
