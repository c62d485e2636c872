"""Quality bounds for the sketch operators.  Since round 5,
``approx_sketches`` proves its own error bounds in-query (emitting
in-bound flags the DuckDB oracle pins to literal 1s) — these tests
check the flags hold at smoke SF and that the underlying raw sketches
really are close to exact, so a bound loosened by accident still has a
tight watchdog."""

from __future__ import annotations

from pyspark.sql import functions as F

from lens_sds_batch_spark.operators.relational import approx_sketches
from lens_sds_batch_spark.sources.parquet import load_table

from .conftest import SF_SMOKE


def test_approx_sketches_flags_green(spark):
    """Every group's in-bound flag must be 1 — the same claim the
    CORRECTNESS oracle pins (literal 1s), checked here pre-driver."""
    rows = approx_sketches(spark, SF_SMOKE).collect()
    assert rows, "no groups?"
    for r in rows:
        assert r["hll_within_20pct"] == 1, r
        assert r["median_within_rank_band"] == 1, r


def test_approx_sketches_exact_columns_match_direct_aggregates(spark):
    got = {r["l_returnflag"]: r for r in approx_sketches(spark, SF_SMOKE).collect()}
    li = load_table(spark, SF_SMOKE, "lineitem")
    exact = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("parts"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert set(got) == set(exact)
    for flag, e in exact.items():
        assert got[flag]["n_parts_exact"] == e["parts"]
        assert got[flag]["n_rows"] == e["n"]


def test_raw_sketches_tight_against_exact(spark):
    """The raw sketch values (not part of the query output any more)
    stay well inside the advertised envelope — a 10% watchdog under the
    query's 20% HLL bound, and a 10%-of-value band for the median."""
    li = load_table(spark, SF_SMOKE, "lineitem")
    rows = (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey").alias("apc"),
            F.percentile_approx("l_extendedprice", 0.5).alias("amed"),
            F.countDistinct("l_partkey").alias("parts"),
            F.expr("percentile(l_extendedprice, 0.5)").alias("median"),
        )
        .collect()
    )
    for r in rows:
        assert abs(r["apc"] - r["parts"]) <= 0.1 * r["parts"] + 1
        assert abs(r["amed"] - r["median"]) <= 0.1 * r["median"]
