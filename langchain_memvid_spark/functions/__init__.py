from langchain_memvid_spark.functions.vector import (
    dot,
    l2_normalize,
    cosine_sim,
    l2_sq,
)
from langchain_memvid_spark.functions.hashing import stable_hash64, metadata_hash
from langchain_memvid_spark.functions.metadata import first_match_col, get_on_first_match
from langchain_memvid_spark.functions.text import (
    tokens,
    token_count,
    word_shingles,
    char_ngrams,
    quality_score_cols,
    lang_id_col,
    fingerprint,
)

__all__ = [
    "dot",
    "l2_normalize",
    "cosine_sim",
    "l2_sq",
    "stable_hash64",
    "metadata_hash",
    "first_match_col",
    "get_on_first_match",
    "tokens",
    "token_count",
    "word_shingles",
    "char_ngrams",
    "quality_score_cols",
    "lang_id_col",
    "fingerprint",
]
