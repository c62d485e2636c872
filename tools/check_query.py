"""Spot-check a subset of registry queries against their DuckDB twins
at sf0.01 — same verdicts as the full driver simulation (it delegates
to tools/drive_driver.compare_one, so the two can never drift).

Usage: python tools/check_query.py name1 [name2 ...]
"""
import sys

sys.path.insert(0, "/root/repo")

import duckdb

from lens_sds_batch_spark.session import get_spark
from tools.drive_driver import SF_GATE, TABLES, compare_one


def main():
    names = sys.argv[1:]
    if not names:
        raise SystemExit("usage: check_query.py name1 [name2 ...]")
    spark = get_spark("check-query")
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as em

    qs, oracles = em.queries(), em.oracle_sql()
    unknown = [n for n in names if n not in qs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_GATE}/{t}.parquet'")
    bad = [n for n in names if not compare_one(con, spark, n, qs[n], oracles.get(n))]
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
