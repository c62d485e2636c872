"""B1 text-format sources: csv/json round-trip against the parquet
ground truth, plus the corrupt-line dead-letter contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from lens_sds_batch_spark.sources.formats import (
    read_csv_table,
    read_json_table,
    split_corrupt,
)
from lens_sds_batch_spark.sources.parquet import load_table

from .conftest import SF_SMOKE

ORDERS_DDL = (
    "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
    "o_totalprice double, o_orderdate timestamp, o_orderpriority string"
)


def _orders_canon(df):
    # timestamps -> epoch seconds so the comparison is format-agnostic
    return df.select(
        "o_orderkey", "o_custkey", "o_orderstatus",
        F.round("o_totalprice", 2).alias("price_r"),
        F.unix_timestamp("o_orderdate").alias("od_epoch"),
        "o_orderpriority",
    )


def test_csv_roundtrip_equals_parquet(spark, tmp_path):
    """Write orders as CSV, read back through read_csv_table with the
    explicit DDL: row-identical to the parquet source."""
    src = load_table(spark, SF_SMOKE, "orders")
    p = str(tmp_path / "orders_csv")
    # the testdata's o_orderdate is TIMESTAMP_NTZ, so the WRITER formats
    # it via timestampNTZFormat; pin both options so the written text
    # and the read-back parse agree regardless of the at-rest flavor
    fmt = "yyyy-MM-dd'T'HH:mm:ss"
    src.coalesce(1).write.option("header", "true").option(
        "timestampFormat", fmt
    ).option("timestampNTZFormat", fmt).csv(p)
    got = read_csv_table(
        spark, p, ORDERS_DDL, options={"timestampFormat": fmt, "timestampNTZFormat": fmt}
    )
    clean, dead = split_corrupt(got)
    assert dead.isEmpty()
    a, b = _orders_canon(clean), _orders_canon(src)
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()


def test_json_roundtrip_equals_parquet(spark, tmp_path):
    src = load_table(spark, SF_SMOKE, "orders")
    p = str(tmp_path / "orders_json")
    src.coalesce(1).write.json(p)
    got = read_json_table(spark, p, ORDERS_DDL)
    clean, dead = split_corrupt(got)
    assert dead.isEmpty()
    a, b = _orders_canon(clean), _orders_canon(src)
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()


def test_corrupt_lines_deadletter_not_dropped(spark, tmp_path):
    """A malformed line neither aborts the scan (FAILFAST) nor vanishes
    (DROPMALFORMED): it lands on the dead side with the raw line kept."""
    p = tmp_path / "mixed.json"
    p.write_text(
        '{"o_orderkey": 1, "o_custkey": 2, "o_orderstatus": "O", '
        '"o_totalprice": 10.5, "o_orderdate": "2024-01-01T00:00:00", '
        '"o_orderpriority": "1-URGENT"}\n'
        "this is not json\n"
        '{"o_orderkey": "NaNkey"}\n'
    )
    got = read_json_table(spark, str(p), ORDERS_DDL)
    clean, dead = split_corrupt(got)
    assert clean.count() == 1 and clean.first()["o_orderkey"] == 1
    dead_rows = dead.collect()
    assert len(dead_rows) == 2
    assert {r["_corrupt"] for r in dead_rows} == {
        "this is not json",
        '{"o_orderkey": "NaNkey"}',
    }
    # totality: every input line in exactly one side
    assert clean.count() + dead.count() == got.count()
