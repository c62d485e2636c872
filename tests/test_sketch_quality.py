"""Quality bounds for the rows-only sketch operators: the sketches
aren't oracle-comparable across engines (different algorithms by
design), so we bound their error against exact answers instead."""

from __future__ import annotations

from pyspark.sql import functions as F

from lens_sds_batch_spark.operators.relational import approx_sketches
from lens_sds_batch_spark.sources.parquet import load_table

from .conftest import SF_SMOKE


def test_approx_sketches_error_bounds(spark):
    approx = {r["l_returnflag"]: r for r in approx_sketches(spark, SF_SMOKE).collect()}
    li = load_table(spark, SF_SMOKE, "lineitem")
    exact = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("parts"),
            F.expr("percentile(l_extendedprice, 0.5)").alias("median"),
        )
        .collect()
    }
    for flag, a in approx.items():
        e = exact[flag]
        # HLL default rsd is 5%; allow 10%
        assert abs(a["approx_parts"] - e["parts"]) <= 0.1 * e["parts"] + 1
        # percentile_approx with default accuracy: within 10% of exact median
        assert abs(a["approx_median_price"] - e["median"]) <= 0.1 * e["median"]
