"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  : flagship pipeline on /root/testdata/sf0.001 — embed the
                documents table with the deterministic Arrow-batched
                HashEmbeddings UDF, then batch semantic search (three
                queries against the whole corpus in ONE scored broadcast
                join + per-query window top-k).
queries()     : every implemented operator from SURVEY.md §2 / §7,
                defined in langchain_memvid_spark.plans.registry.
oracle_sql()  : the DuckDB-equivalent SQL for each query.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from langchain_memvid_spark.embeddings import HashEmbeddings
    from langchain_memvid_spark.functions.vector import cosine_sim
    from langchain_memvid_spark.sources.catalog import load_table

    sf_dir = "/root/testdata/sf0.001"
    docs = load_table(spark, sf_dir, "documents")
    emb = HashEmbeddings(dim=64)

    # HashEmbeddings emits unit vectors, so cosine == dot on this column
    corpus = docs.withColumn("embedding", emb.udf()(F.col("text"))).cache()

    queries = ["table scan join order", "stream window batch", "vector hash merge"]
    qrows = [(i, q, emb.embed_query(q)) for i, q in enumerate(queries)]
    qdf = spark.createDataFrame(qrows, "query_id INT, query STRING, qvec ARRAY<FLOAT>")

    scored = corpus.crossJoin(F.broadcast(qdf)).withColumn(
        "score", cosine_sim(F.col("embedding"), F.col("qvec"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select(
            "query_id",
            "query",
            "doc_id",
            "text",
            "source",
            F.round("score", 4).alias("score"),
            "rank",
        )
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from langchain_memvid_spark.plans.registry import query_map

    return query_map()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL for each key in queries()."""
    from langchain_memvid_spark.plans.registry import oracle_map

    return oracle_map()
