"""Non-degeneracy audit: a hash-green query can still be VACUOUSLY
green (both engines agreeing on an all-NULL column, an empty result,
or a constant column) — r6 found exactly that in asof_join, whose
backward arm was all-NULL because the synthetic orders and events
calendars are disjoint.  This tool runs every registry query at
sf0.01 and reports, per column: null fraction and distinct count,
flagging all-NULL columns, zero-row results, and single-valued
columns so a human can judge whether the degeneracy is semantic
(e.g. a literal arm label) or a silent loss of test power.

Usage: python tools/degeneracy_audit.py [sf_dir]
"""
from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from lens_sds_batch_spark.session import get_spark  # noqa: E402


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("degeneracy-audit")
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as em

    flagged = {}
    for name, fn in em.queries().items():
        df = fn(spark, sf_dir)
        aggs = [F.count(F.lit(1)).alias("__n")]
        for c in df.columns:
            aggs.append(F.count(F.col(c)).alias(f"nn::{c}"))
            aggs.append(F.count_distinct(F.col(c)).alias(f"nd::{c}"))
        r = df.agg(*aggs).collect()[0].asDict()
        n = r["__n"]
        flags = []
        if n == 0:
            flags.append("ZERO_ROWS")
        for c in df.columns:
            if n and r[f"nn::{c}"] == 0:
                flags.append(f"ALL_NULL:{c}")
            elif n > 1 and r[f"nd::{c}"] == 1:
                flags.append(f"CONSTANT:{c}")
        status = "; ".join(flags) if flags else "ok"
        print(f"{name}: rows={n} {status}", flush=True)
        if flags:
            flagged[name] = flags
    print(f"\n=== flagged: {len(flagged)}")
    spark.stop()


if __name__ == "__main__":
    main()
