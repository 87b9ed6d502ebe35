"""Text-analysis operators over the documents table.

Each wraps the pure-Catalyst scalar functions in functions/text.py into
a full-table transformation. All stay inside whole-stage codegen — at
100 TB these are scan-bound, not CPU-bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from langchain_memvid_spark.functions.text import (
    fingerprint,
    lang_id_col,
    quality_score_cols,
    token_count,
)


def token_counts(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token counts + chars-per-token ratio."""
    n_tok = token_count(F.col(text_col))
    return documents.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        F.length(F.col(text_col)).alias("n_chars_calc"),
        F.round(
            F.length(F.col(text_col)).cast("double") / F.greatest(n_tok, F.lit(1)).cast("double"), 4
        ).alias("chars_per_token"),
    )


def quality_scores(documents: DataFrame, text_col: str = "text") -> DataFrame:
    cols = quality_score_cols(F.col(text_col))
    return documents.select("doc_id", *[c.alias(name) for name, c in cols.items()])


def lang_id(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-heuristic language ID + agreement flag vs the tagged
    lang column (documents.lang)."""
    pred = lang_id_col(F.col(text_col))
    return documents.select(
        "doc_id",
        F.col("lang").alias("tagged_lang"),
        pred.alias("pred_lang"),
        (pred == F.col("lang")).cast("int").alias("agree"),
    )


def fingerprints(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """sha256 fingerprint of normalized text — the exact-dedup key."""
    return documents.select("doc_id", fingerprint(F.col(text_col)).alias("fp"))


def chunk_documents(
    documents: DataFrame,
    chunk_tokens: int = 64,
    overlap: int = 16,
    text_col: str = "text",
) -> DataFrame:
    """Split documents into overlapping fixed-token-count chunks — the
    unit the reference stores and searches (its "chunk",
    encoder.py:79-83), generalized to a corpus-scale operator.

    Pure Catalyst: tokens → sequence of chunk starts (stride =
    chunk_tokens - overlap) → explode → slice+join per chunk. No UDF,
    no shuffle — a 100 TB corpus chunks itself in one codegen'd map
    stage; chunk_id is deterministic (position), so downstream dedup/
    embedding keys on (doc_id, chunk_id)."""
    from langchain_memvid_spark.functions.text import tokens as _tokens

    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    step = chunk_tokens - overlap
    toks = _tokens(F.col(text_col))
    n = F.size(toks)
    starts = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(step))
    return (
        documents.select("doc_id", toks.alias("__toks"), starts.alias("__starts"))
        .select("doc_id", "__toks", F.posexplode("__starts").alias("chunk_id", "__start"))
        .select(
            "doc_id",
            "chunk_id",
            F.slice(F.col("__toks"), F.col("__start") + 1, chunk_tokens).alias("__chunk"),
        )
        .select(
            "doc_id",
            "chunk_id",
            F.size("__chunk").alias("n_chunk_tokens"),
            F.array_join("__chunk", " ").alias("chunk_text"),
        )
    )
