"""Runnable-style retriever facade over SparkVectorStore.

Mirrors the reference Retriever's public surface
(/root/reference/src/langchain_memvid/retriever.py:78-169:
``invoke`` / ``ainvoke`` / ``batch`` / ``abatch`` / ``retrieve`` /
``_get_relevant_documents`` / ``get_document_by_id``) so a LangChain
user can drop it where a ``BaseRetriever`` goes — duck-typed rather
than subclassing, since langchain-core is not a dependency here.

The Spark-first difference is ``batch``: the reference loops queries
sequentially (retriever.py:110-136); here all queries score in ONE
broadcast join (store.batch_search) and the per-query Document lists
are regrouped driver-side from the single k×Q-row result.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from langchain_memvid_spark.core.store import SparkVectorStore
from langchain_memvid_spark.exceptions import RetrievalError
from langchain_memvid_spark.functions.metadata import get_on_first_match


@dataclass
class Document:
    """Minimal LangChain-Document shape (page_content + metadata);
    interoperates with ``SparkVectorStore.from_documents`` which
    duck-types on exactly these attributes."""

    page_content: str
    metadata: dict[str, Any] = field(default_factory=dict)


class SparkRetriever:
    """≙ reference Retriever (retriever.py:27-96): semantic search
    facade returning Documents with essential metadata, ``k`` results
    per query, plus the frame-decode surface (decode_frame /
    decode_all_frames / clear_cache, retriever.py:318-447) — a "frame"
    here is a payload row (doc_id IS the frame number; the reference's
    doc→frame mapping is the identity in this engine)."""

    _SEARCH_TYPES = ("similarity", "mmr", "similarity_score_threshold")

    def __init__(
        self,
        store: SparkVectorStore,
        k: int = 4,
        frame_cache_size: int = 100,
        search_type: str = "similarity",
        search_kwargs: dict[str, Any] | None = None,
    ):
        """``search_type``/``search_kwargs`` mirror LangChain's
        ``as_retriever`` contract (beyond the reference, whose
        retriever is similarity-only): "similarity" (default),
        "mmr" (kwargs: fetch_k, lambda_mult, filter), or
        "similarity_score_threshold" (kwargs: score_threshold in
        [0, 1] over the normalized relevance map, filter)."""
        if search_type not in self._SEARCH_TYPES:
            raise RetrievalError(
                f"search_type {search_type!r} not in {self._SEARCH_TYPES}"
            )
        if search_type == "similarity_score_threshold" and (
            not search_kwargs or "score_threshold" not in search_kwargs
        ):
            # relevance scores are clamped to [0,1], so a 0.0 default
            # would silently disable the threshold — require it up
            # front (upstream LangChain also raises when it's missing)
            raise RetrievalError(
                "search_type='similarity_score_threshold' requires "
                "search_kwargs={'score_threshold': ...}"
            )
        # honor search_kwargs={'k': n} HERE, not only in as_retriever,
        # so direct construction and the factory share one contract
        # (ADVICE r6)
        search_kwargs = dict(search_kwargs or {})
        k = search_kwargs.pop("k", k)
        self.store = store
        self.k = k
        self.frame_cache_size = frame_cache_size
        self.search_type = search_type
        self.search_kwargs = search_kwargs
        self._frame_cache: dict[int, Document] = {}

    # ----------------------------------------------------- Runnable surface

    def invoke(self, input: str, config: Any | None = None) -> list[Document]:
        """≙ retriever.py:78-91."""
        return self.retrieve(input)

    async def ainvoke(self, input: str, config: Any | None = None) -> list[Document]:
        """≙ retriever.py:93-106 (delegates to the sync path, as the
        reference does)."""
        return self.retrieve(input)

    def batch(
        self,
        inputs: list[str],
        config: Any | None = None,
        *,
        return_exceptions: bool = False,
    ) -> list[list[Document] | Exception]:
        """≙ retriever.py:108-136, re-planned for Spark: one scored
        broadcast join for ALL queries instead of a sequential loop —
        Q queries cost one job, not Q."""
        if not inputs:
            return []
        try:
            rows = self.store.batch_search(list(inputs), k=self.k).collect()
        except Exception as e:  # noqa: BLE001 - parity with reference semantics
            if return_exceptions:
                return [e for _ in inputs]
            raise
        by_query: dict[int, list[tuple[int, Document]]] = {i: [] for i in range(len(inputs))}
        for r in rows:
            doc = Document(
                page_content=r["text"],
                metadata={
                    "doc_id": r["doc_id"],
                    "similarity": float(r["similarity"]),
                    "metadata_type": "essential",
                },
            )
            by_query[int(r["query_id"])].append((int(r["rank"]), doc))
        return [[d for _, d in sorted(by_query[i])] for i in range(len(inputs))]

    async def abatch(
        self,
        inputs: list[str],
        config: Any | None = None,
        *,
        return_exceptions: bool = False,
    ) -> list[list[Document] | Exception]:
        """≙ retriever.py:138-155."""
        return self.batch(inputs, config, return_exceptions=return_exceptions)

    # ------------------------------------------------------------- retrieval

    def retrieve(self, query: str) -> list[Document]:
        """≙ retriever.py:157-169."""
        return self._get_relevant_documents(query)

    def _get_relevant_documents(self, query: str) -> list[Document]:
        """≙ retriever.py:171-258: essential-metadata Documents with
        source/category/similarity/doc_id/metadata_type fields.
        Dispatches on ``search_type`` (similarity / mmr /
        similarity_score_threshold)."""
        try:
            if self.search_type == "mmr":
                kw = self.search_kwargs
                docs = self.store.max_marginal_relevance_search(
                    query,
                    k=self.k,
                    fetch_k=kw.get("fetch_k", 20),
                    lambda_mult=kw.get("lambda_mult", 0.5),
                    filter=kw.get("filter"),
                    nprobe=kw.get("nprobe"),
                )
                return [
                    Document(page_content=d["page_content"], metadata=d["metadata"])
                    for d in docs
                ]
            if self.search_type == "similarity_score_threshold":
                kw = self.search_kwargs
                thr = kw["score_threshold"]  # required at construction
                scored = self.store.similarity_search_with_relevance_scores(
                    query, k=self.k, filter=kw.get("filter"), nprobe=kw.get("nprobe")
                )
                return [
                    Document(
                        page_content=d["page_content"],
                        metadata={**d["metadata"], "relevance_score": s},
                    )
                    for d, s in scored
                    if s >= thr
                ]
            if (
                self.search_kwargs.get("filter") is not None
                or self.search_kwargs.get("nprobe") is not None
            ):
                scored = self.store.similarity_search_with_score(
                    query,
                    k=self.k,
                    filter=self.search_kwargs.get("filter"),
                    nprobe=self.search_kwargs.get("nprobe"),
                )
                # SAME essential-metadata shape as the unfiltered branch
                # below (explicit source/category keys even when absent
                # from the stored metadata) — the two paths must not
                # return differently shaped Documents (ADVICE r6)
                return [
                    Document(
                        page_content=d["page_content"],
                        metadata={
                            "source": d["metadata"].get("source"),
                            "category": d["metadata"].get("category"),
                            "metadata_type": "essential",
                            **d["metadata"],
                            # AFTER the spread so the fallback read is
                            # authoritative (later keys win): the
                            # reference's exact score-with-fallback
                            # (vectorstore.py:678-684) — first of
                            # similarity/distance that IS a float,
                            # 0.0 otherwise
                            "similarity": get_on_first_match(
                                d["metadata"],
                                "similarity",
                                "distance",
                                expected_type=float,
                                default=0.0,
                            ),
                        },
                    )
                    for d, _ in scored
                ]
            results = self.store.search_text(query, k=self.k)
            return [
                Document(
                    page_content=r.text,
                    metadata={
                        "source": r.source,
                        "category": r.category,
                        "similarity": r.similarity,
                        "metadata_type": "essential",
                        **(r.metadata or {}),
                    },
                )
                for r in results
            ]
        except RetrievalError:
            raise
        except Exception as e:  # noqa: BLE001 - parity: wrap in RetrievalError
            raise RetrievalError(f"Failed to retrieve documents: {e}") from e

    def get_document_by_id(
        self, doc_id: int, include_full_metadata: bool = False
    ) -> Document | None:
        """≙ retriever.py:258-316 (essential vs full metadata tiers)."""
        d = self.store.get_document_by_id(doc_id, include_full_metadata)
        if d is None:
            return None
        return Document(page_content=d["page_content"], metadata=d["metadata"])

    # --------------------------------------------------------- frame decode

    def decode_frame(self, frame_no: int) -> Document | None:
        """≙ retriever.py:318-378: fetch one payload row ("frame"),
        LRU-cached so repeated access skips the Spark job.
        frame_cache_size <= 0 disables caching."""
        if frame_no in self._frame_cache:
            doc = self._frame_cache.pop(frame_no)  # move-to-end: true LRU
            self._frame_cache[frame_no] = doc
            return doc
        d = self.store.get_document_by_id(frame_no, include_full_metadata=True)
        if d is None:
            return None
        doc = Document(page_content=d["page_content"], metadata=d["metadata"])
        if self.frame_cache_size > 0:
            while len(self._frame_cache) >= self.frame_cache_size:
                self._frame_cache.pop(next(iter(self._frame_cache)))
            self._frame_cache[frame_no] = doc
        return doc

    def decode_all_frames(self) -> list[Document]:
        """≙ retriever.py:380-418: ONE scan of the payload table, not a
        per-frame loop."""
        return [
            Document(page_content=d["page_content"], metadata=d["metadata"])
            for d in self.store.get_all_documents()
        ]

    def clear_cache(self) -> None:
        """≙ retriever.py:440-447."""
        self._frame_cache.clear()
