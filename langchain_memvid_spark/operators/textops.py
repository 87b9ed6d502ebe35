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
