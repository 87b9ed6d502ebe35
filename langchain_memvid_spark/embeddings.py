"""Deterministic embeddings.

The reference's pluggable function surface is the LangChain
``Embeddings`` interface — embed_documents(List[str]) /
embed_query(str) (used at /root/reference/src/langchain_memvid/
index.py:139,190,320,424). Its test fixture ``BenchmarkEmbeddings``
(/root/reference/tests/conftest.py:89-111) derives a deterministic
random unit vector from sha256(text) — exactly the property we need so
similarity results hash-match the DuckDB oracle across runs.

Spark mapping: a Pandas UDF (Arrow-batched) — the vectorized batch
call mirrors the reference's batched embed_documents and is the fast
path for Python model inference on executors. A real model (sentence
transformer etc.) plugs in by swapping ``embed_batch``.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType


class HashEmbeddings:
    """sha256-seeded deterministic unit vectors (float32).

    Semantics of /root/reference/tests/conftest.py:89-111: seed a PRNG
    from the text hash, draw `dim` uniform values, L2-normalize.
    """

    def __init__(self, dim: int = 64):
        self.dim = dim

    def _vec(self, text: str) -> np.ndarray:
        seed = int(hashlib.sha256(text.encode("utf-8")).hexdigest()[:8], 16)
        rng = np.random.RandomState(seed)
        v = rng.uniform(-1.0, 1.0, self.dim).astype(np.float32)
        n = float(np.linalg.norm(v))
        return v / n if n > 0 else v

    # LangChain Embeddings-compatible surface
    def embed_documents(self, texts: list[str]) -> list[list[float]]:
        return [self._vec(t).tolist() for t in texts]

    def embed_query(self, text: str) -> list[float]:
        return self._vec(text).tolist()

    def embed_batch(self, texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: self._vec("" if t is None else str(t)).tolist())

    def udf(self):
        """Arrow-batched Pandas UDF: text -> array<float>."""
        dim = self.dim

        @F.pandas_udf(ArrayType(FloatType()))
        def embed_udf(texts: pd.Series) -> pd.Series:
            emb = HashEmbeddings(dim)
            return emb.embed_batch(texts)

        return embed_udf
