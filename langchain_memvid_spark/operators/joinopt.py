"""Join strategies for skew and co-location at cluster scale.

The reference is single-process and joins nothing (SURVEY.md §2b);
these are the Spark-side techniques a 100 TB deployment of this engine
leans on when AQE alone isn't enough:

  - salted_join: pre-split hot build-side keys so one executor doesn't
    receive an entire hot key's rows. Deterministic salt (hash of fact
    columns, not rand()) keeps results reproducible and oracle-safe.
  - bucketed co-located join: both sides pre-bucketed on the join key
    at write time join WITHOUT a shuffle — the classic layout
    investment for fact-to-fact joins repeated across many queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    salt_cols: list[str],
    n_salts: int = 8,
) -> DataFrame:
    """Inner join with build-side salting for skewed keys.

    The fact side gets a deterministic salt in [0, n_salts) from a hash
    of `salt_cols` (NOT rand() — results must replay identically); the
    dim side is exploded n_salts× so every (key, salt) bucket finds its
    match. Each hot key's rows now spread over n_salts shuffle
    partitions instead of one. Row multiplicity is unchanged for inner
    joins: each fact row matches exactly the dim rows it matched
    before, under exactly one salt value."""
    salt = F.pmod(F.xxhash64(*salt_cols), F.lit(n_salts)).cast("int")
    salted_fact = fact.withColumn("__salt", salt)
    salted_dim = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    # DataFrame-qualified references, not bare F.col: when fact_key and
    # dim_key share a name (the common case for a generic helper) a
    # bare column would be AMBIGUOUS against the joined plan
    cond = (salted_fact[fact_key] == salted_dim[dim_key]) & (
        salted_fact["__salt"] == salted_dim["__salt"]
    )
    return salted_fact.join(salted_dim, cond).drop("__salt")


def write_bucketed(
    df: DataFrame, table: str, key: str, n_buckets: int, path: str
) -> None:
    """Persist `df` bucketed (and sorted) by `key` as an external table.
    Two tables bucketed identically on their join key sort-merge join
    with ZERO Exchange — the shuffle was paid once at write time and is
    amortized over every subsequent join."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # Pre-partition on the bucket key: without this every write task
    # emits one file PER bucket (tasks × buckets small files); with it
    # each bucket is one task writing one file — the layout Hive/Spark
    # bucketing readers expect, and far fewer files at scale.
    (
        df.repartition(n_buckets, F.col(key))
        .write.bucketBy(n_buckets, key)
        .sortBy(key)
        .option("path", path)
        .mode("overwrite")
        .saveAsTable(table)
    )


def bucketed_revenue_join(
    spark: SparkSession,
    orders: DataFrame,
    lineitem: DataFrame,
    base_path: str,
    n_buckets: int = 8,
) -> DataFrame:
    """Fact-to-fact join via bucketed layout: bucket both orders and
    lineitem by orderkey, then join + aggregate revenue per order
    priority. The join stage reads both sides pre-partitioned — no
    Exchange in the plan (verified in tests)."""
    write_bucketed(orders, "bk_orders", "o_orderkey", n_buckets, f"{base_path}/bk_orders")
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "lo_orderkey"),
        "bk_lineitem",
        "lo_orderkey",
        n_buckets,
        f"{base_path}/bk_lineitem",
    )
    o = spark.table("bk_orders")
    li = spark.table("bk_lineitem")
    # fact-to-fact: force sort-merge (broadcast would defeat the point
    # at toy SF; at 100 TB neither side broadcasts anyway) — with both
    # sides bucketed on the key, SMJ needs no shuffle Exchange.
    joined = o.hint("merge").join(li, F.col("o_orderkey") == F.col("lo_orderkey"))
    return (
        joined.groupBy("o_orderpriority")
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).cast(
                    "decimal(18,4)"
                )
            )
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )
