"""Retriever facade tests — ported shapes from the reference suite
(/root/reference/tests/test_retriever.py: retrieval returns Documents,
k respected, batch returns one list per input, errors wrap in
RetrievalError)."""

import pytest


def test_as_retriever_factory(spark):
    from langchain_memvid_spark import SparkVectorStore

    s = SparkVectorStore.from_texts(["one", "two"], spark)
    r = s.as_retriever(k=1)
    docs = r.invoke("one")
    assert len(docs) == 1 and docs[0].page_content == "one"

from langchain_memvid_spark import Document, RetrievalError, SparkRetriever, SparkVectorStore

TEXTS = [
    "The quick brown fox jumps over the lazy dog",
    "Python is a great programming language",
    "The weather is sunny today",
    "Machine learning with spark is scalable",
    "Distributed joins shuffle on their keys",
]
METAS = [{"id": i, "source": f"doc{i}.txt", "category": "misc"} for i in range(len(TEXTS))]


@pytest.fixture(scope="module")
def retriever(spark):
    store = SparkVectorStore.from_texts(TEXTS, spark, metadatas=METAS)
    return SparkRetriever(store, k=3)


def test_search_type_dispatch(spark):
    """as_retriever(search_type=...) mirrors the upstream contract:
    mmr routes through max_marginal_relevance_search,
    similarity_score_threshold filters on the normalized relevance
    score, an unknown type raises, and search_kwargs={'k': n} is
    respected."""
    store = SparkVectorStore.from_texts(TEXTS, spark, metadatas=METAS)
    mmr = store.as_retriever(k=2, search_type="mmr", search_kwargs={"fetch_k": 4})
    docs = mmr.invoke(TEXTS[0])
    assert len(docs) == 2 and docs[0].page_content == TEXTS[0]
    want = store.max_marginal_relevance_search(TEXTS[0], k=2, fetch_k=4)
    assert [d.page_content for d in docs] == [d["page_content"] for d in want]

    thr = store.as_retriever(
        k=5, search_type="similarity_score_threshold", search_kwargs={"score_threshold": 0.99}
    )
    hits = thr.invoke(TEXTS[2])
    assert [d.page_content for d in hits] == [TEXTS[2]]  # only the self-match >= .99
    assert hits[0].metadata["relevance_score"] >= 0.99

    with pytest.raises(RetrievalError):
        store.as_retriever(search_type="nope")
    kw = store.as_retriever(search_kwargs={"k": 1})
    assert len(kw.invoke(TEXTS[1])) == 1


def test_similarity_search_kwargs_filter(spark):
    """The default similarity path honors search_kwargs['filter']."""
    store = SparkVectorStore.from_texts(
        TEXTS, spark, metadatas=[{**m, "parity": i % 2} for i, m in enumerate(METAS)]
    )
    r = store.as_retriever(k=5, search_kwargs={"filter": {"parity": 1}})
    docs = r.invoke(TEXTS[0])
    assert len(docs) == 2  # ids 1 and 3
    assert all(d.metadata["parity"] == 1 for d in docs)


def test_invoke_returns_documents(retriever):
    docs = retriever.invoke("programming in python")
    assert len(docs) == 3
    assert all(isinstance(d, Document) for d in docs)
    assert all(d.metadata["metadata_type"] == "essential" for d in docs)
    assert all("similarity" in d.metadata and "source" in d.metadata for d in docs)


def test_retrieve_matches_invoke(retriever):
    q = "sunny weather"
    assert [d.page_content for d in retriever.invoke(q)] == [
        d.page_content for d in retriever.retrieve(q)
    ]


def test_ainvoke_delegates_to_sync(retriever):
    import asyncio

    # asyncio.run, not get_event_loop().run_until_complete: the latter
    # breaks when ANY earlier test in the process used asyncio.run
    # (which closes the policy loop) — order-dependent flakiness
    docs = asyncio.run(retriever.ainvoke("fox"))
    assert [d.page_content for d in docs] == [d.page_content for d in retriever.invoke("fox")]


def test_batch_one_list_per_input_and_matches_single(retriever):
    queries = ["python programming", "lazy dog", "spark scale"]
    batched = retriever.batch(queries)
    assert len(batched) == 3
    for q, docs in zip(queries, batched):
        single = retriever.invoke(q)
        assert [d.page_content for d in docs] == [d.page_content for d in single]
        sims = [d.metadata["similarity"] for d in docs]
        assert sims == sorted(sims, reverse=True)


def test_batch_empty_input(retriever):
    assert retriever.batch([]) == []


def test_batch_return_exceptions(retriever, monkeypatch):
    def boom(*a, **k):
        raise RuntimeError("Test error")

    monkeypatch.setattr(retriever.store, "batch_search", boom)
    out = retriever.batch(["a", "b"], return_exceptions=True)
    assert len(out) == 2 and all(isinstance(e, RuntimeError) for e in out)
    with pytest.raises(RuntimeError):
        retriever.batch(["a"])


def test_error_handling_wraps_retrieval_error(retriever, monkeypatch):
    # ≙ reference TestRetrieverErrorHandling.test_error_handling
    def boom(*a, **k):
        raise RuntimeError("Test error")

    monkeypatch.setattr(retriever.store, "search_text", boom)
    with pytest.raises(RetrievalError):
        retriever._get_relevant_documents("test query")


def test_get_document_by_id_tiers(retriever):
    d = retriever.get_document_by_id(0)
    assert d is not None and d.metadata["metadata_type"] == "essential"
    full = retriever.get_document_by_id(0, include_full_metadata=True)
    assert full is not None and full.metadata["metadata_type"] == "full"
    assert retriever.get_document_by_id(999) is None


def test_from_documents_roundtrip(spark):
    docs = [Document(page_content=t, metadata=m) for t, m in zip(TEXTS, METAS)]
    store = SparkVectorStore.from_documents(docs, spark)
    assert store.get_document_count() == len(TEXTS)


def test_decode_frame_and_caching(retriever):
    d1 = retriever.decode_frame(0)
    assert d1 is not None and d1.metadata["metadata_type"] == "full"
    assert 0 in retriever._frame_cache
    # second call is served from cache (same object)
    assert retriever.decode_frame(0) is d1
    assert retriever.decode_frame(9999) is None
    retriever.clear_cache()
    assert retriever._frame_cache == {}


def test_decode_frame_cache_eviction(retriever):
    retriever.clear_cache()
    retriever.frame_cache_size = 2
    retriever.decode_frame(0)
    retriever.decode_frame(1)
    retriever.decode_frame(2)  # evicts frame 0 (FIFO-LRU)
    assert set(retriever._frame_cache) == {1, 2}
    retriever.frame_cache_size = 100


def test_decode_all_frames(retriever):
    docs = retriever.decode_all_frames()
    assert len(docs) == 5
    assert all(isinstance(d, Document) for d in docs)


def test_direct_construction_honors_search_kwargs_k(spark):
    """ADVICE r6: SparkRetriever built directly must honor
    search_kwargs={'k': n} exactly like as_retriever does."""
    store = SparkVectorStore.from_texts(TEXTS, spark, metadatas=METAS)
    r = SparkRetriever(store, k=4, search_kwargs={"k": 2})
    assert r.k == 2
    assert len(r.invoke(TEXTS[0])) == 2
    # factory path unchanged
    assert store.as_retriever(k=4, search_kwargs={"k": 2}).k == 2


def test_filtered_and_unfiltered_metadata_same_shape(spark):
    """ADVICE r6: the similarity path must return the SAME essential-
    metadata key set whether or not a filter is set."""
    store = SparkVectorStore.from_texts(TEXTS, spark, metadatas=METAS)
    plain = SparkRetriever(store, k=2).invoke(TEXTS[1])
    filtered = SparkRetriever(
        store, k=2, search_kwargs={"filter": {"category": "misc"}}
    ).invoke(TEXTS[1])
    base_keys = {"source", "category", "similarity", "metadata_type"}
    for d in plain + filtered:
        assert base_keys <= set(d.metadata)
        assert d.metadata["metadata_type"] == "essential"
    assert plain[0].metadata["source"] == filtered[0].metadata["source"]
