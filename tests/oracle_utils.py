"""Local emulation of the driver's Spark-vs-DuckDB compare
(row-count + schema-agnostic, order-insensitive value multiset)."""

from __future__ import annotations

import math

import duckdb

from lens_sds_batch_spark.sources.parquet import TABLES


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        return f"{v:.6f}"
    return str(v)


def _multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_canon(r[i]) for i in order) for r in rows)


def assert_match(spark_df, duck_sql: str, sf_dir: str, limit: int | None = None):
    con = duck_connect(sf_dir)
    duck_rows = con.execute(duck_sql).fetchall()
    duck_cols = [d[0] for d in con.description]
    spark_rows = [tuple(r) for r in spark_df.collect()]
    spark_cols = spark_df.columns
    assert sorted(spark_cols) == sorted(duck_cols), f"columns differ: {spark_cols} vs {duck_cols}"
    assert len(spark_rows) == len(duck_rows), f"row counts differ: {len(spark_rows)} vs {len(duck_rows)}"
    ms, md = _multiset(spark_cols, spark_rows), _multiset(duck_cols, duck_rows)
    if ms != md:
        diff_a = [r for r in ms if r not in md][:5]
        diff_b = [r for r in md if r not in ms][:5]
        raise AssertionError(f"value mismatch.\n spark-only: {diff_a}\n duck-only: {diff_b}")
