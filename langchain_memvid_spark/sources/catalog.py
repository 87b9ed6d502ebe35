"""Testdata catalog: parquet sources for the TPC-H-ish star schema.

The reference's only sources are in-memory lists of texts/Documents
(/root/reference/src/langchain_memvid/vectorstore.py:174,254); here the
source layer is `spark.read.parquet` — columnar scans with predicate
pushdown and column pruning supplied by the Parquet datasource.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table.

    events.parquet stores TIMESTAMP(NANOS), which Spark cannot represent
    (micros max). We read nanos as long (legacy conf, runtime-settable)
    and truncate to micros with integer division — matching DuckDB's
    own nanos→micros truncation bit-for-bit.
    """
    path = f"{sf_dir}/{name}.parquet"
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # timestamp->string formatting must be UTC to hash-match the
        # DuckDB oracle even when the caller's session isn't ours
        # (the driver builds its own SparkSession)
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:
        pass  # conf not recognized on some builds; fall back to plain read
    df = spark.read.parquet(path)
    for field in df.schema.fields:
        if field.name == "ts" and field.dataType.typeName() in ("long", "bigint"):
            from pyspark.sql import functions as F

            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif field.name == "ts" and field.dataType.typeName() == "timestamp_ntz":
            # newer generator writes TIMESTAMP(MICROS) without a zone;
            # normalize to the session-zoned type (UTC session → same
            # instant) so downstream epoch casts keep working
            from pyspark.sql import functions as F

            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql use."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


class Catalog:
    """Lazy accessor: `cat.lineitem` etc."""

    def __init__(self, spark: SparkSession, sf_dir: str):
        self._spark = spark
        self._sf_dir = sf_dir

    def __getattr__(self, name: str) -> DataFrame:
        if name in TABLES:
            return load_table(self._spark, self._sf_dir, name)
        raise AttributeError(name)
