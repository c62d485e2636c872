"""Parquet table loaders for the driver-generated testdata.

The source layer of the engine (reference A1: Redis blob source,
``src/lens/file_storage.clj:12-17``).  Here the at-rest format is
columnar parquet: scans get predicate pushdown + column pruning from
Catalyst for free, which is the 100 TB-scale replacement for the
reference's "fetch one blob, parse it all" model.
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


def ensure_engine_confs(spark: SparkSession) -> None:
    """Make any externally-provided SparkSession safe for this engine
    (the driver constructs its own session — these are runtime-settable
    SQL confs, unlike master/memory):

    - UTC session timezone: parquet timestamps must mean the same
      instant as in the DuckDB oracle (naive-UTC), or every epoch
      canonicalization skews by the local offset.
    - nanosAsLong: events.parquet carries TIMESTAMP(NANOS), which Spark
      otherwise refuses to read at all (PARQUET_TYPE_ILLEGAL).
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "true")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    ensure_engine_confs(spark)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with the nano-precision timestamp exposed as exact BIGINT
    nanoseconds (``ts_ns``).  The parquet type is TIMESTAMP(NANOS),
    which Spark reads as int64 under ``nanosAsLong`` (session.py) and
    DuckDB exposes via ``epoch_ns(ts)`` — both engines see identical
    integers, so ordering and window math are bit-exact."""
    from pyspark.sql import functions as F

    df = load_table(spark, sf_dir, "events")
    return df.select(
        "event_id",
        F.col("ts").cast("bigint").alias("ts_ns"),
        "user_id",
        "event_type",
        "value",
        "props",
    )


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register each table as a temp view (for spark.sql-based operators)."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
