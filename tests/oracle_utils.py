"""Local emulation of the driver's Spark-vs-DuckDB compare
(row-count + order-insensitive value multiset + type-FAMILY check).

The driver's value hash is type-sensitive: round 1 proved that a
DuckDB ``sum(INTEGER)`` (HUGEINT → arrow decimal128(38,0)) hashes
differently from Spark's BIGINT even when every value is equal.  The
family check below reproduces that sensitivity locally so an uncast
integer sum in an oracle SQL fails pytest, not CORRECTNESS_r{N}."""

from __future__ import annotations

import math

import duckdb
import pyarrow as pa

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


def _arrow_family(t: pa.DataType) -> str:
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_timestamp(t) or pa.types.is_date(t):
        return "timestamp"
    if pa.types.is_list(t) or pa.types.is_large_list(t) or pa.types.is_fixed_size_list(t):
        return "list"
    return str(t)


_SPARK_FAMILY = {
    "byte": "int", "short": "int", "int": "int", "integer": "int",
    "long": "int", "bigint": "int",
    "float": "float", "double": "float",
    "boolean": "bool", "string": "string", "binary": "binary",
    "timestamp": "timestamp", "timestamp_ntz": "timestamp", "date": "timestamp",
}


def _spark_family(dt) -> str:
    name = dt.typeName()
    if name.startswith("decimal"):
        return "decimal"
    if name == "array":
        return "list"
    return _SPARK_FAMILY.get(name, name)


def assert_type_families(spark_df, duck_arrow: pa.Table):
    """Per-column type-family equality, the driver-hash proxy.
    DuckDB HUGEINT surfaces as decimal128(38,0) — mismatching Spark's
    int family exactly the way the driver's hash does."""
    duck = {f.name: _arrow_family(f.type) for f in duck_arrow.schema}
    spark = {f.name: _spark_family(f.dataType) for f in spark_df.schema.fields}
    mismatches = {
        c: (spark.get(c), duck.get(c))
        for c in set(duck) | set(spark)
        if spark.get(c) != duck.get(c)
    }
    assert not mismatches, (
        f"type-family mismatch (spark, duck): {mismatches} — an uncast "
        "integer sum in the oracle SQL? (DuckDB sum(INT) is HUGEINT)"
    )


def assert_match(spark_df, duck_sql: str, sf_dir: str):
    con = duck_connect(sf_dir)
    duck_arrow = con.execute(duck_sql).arrow()
    assert_type_families(spark_df, duck_arrow)
    duck_rows = con.execute(duck_sql).fetchall()
    duck_cols = [d[0] for d in con.description]
    spark_rows = [tuple(r) for r in spark_df.collect()]
    spark_cols = spark_df.columns
    # vacuity guard (r6 degeneracy audit): a hash-green EMPTY result or
    # ALL-NULL column means both engines agree on nothing — the asof
    # backward arm shipped exactly that way.  No current query has a
    # legitimately empty/all-NULL shape at any test SF; if one ever
    # does, allowlist it HERE with a comment, don't weaken the guard.
    assert spark_rows, "empty result — vacuously green"
    for i, c in enumerate(spark_cols):
        assert any(r[i] is not None for r in spark_rows), (
            f"column {c} is ALL NULL — vacuously green (degeneracy-audit class)"
        )
    assert sorted(spark_cols) == sorted(duck_cols), f"columns differ: {spark_cols} vs {duck_cols}"
    assert len(spark_rows) == len(duck_rows), f"row counts differ: {len(spark_rows)} vs {len(duck_rows)}"
    ms, md = _multiset(spark_cols, spark_rows), _multiset(duck_cols, duck_rows)
    if ms != md:
        diff_a = [r for r in ms if r not in md][:5]
        diff_b = [r for r in md if r not in ms][:5]
        raise AssertionError(f"value mismatch.\n spark-only: {diff_a}\n duck-only: {diff_b}")
