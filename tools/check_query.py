"""Spot-check a subset of registry queries against their DuckDB twins
at sf0.01 (same canonicalization as tools/drive_driver.py — schema,
type families, sorted-column tuple multisets).

Usage: python tools/check_query.py name1 [name2 ...]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb

from lens_sds_batch_spark.session import get_spark
from tests.oracle_utils import assert_type_families
from tools.drive_driver import SF_GATE, TABLES, rows_to_ms


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
    bad = []
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, SF_GATE)
            scols, srows = sdf.columns, sdf.collect()
            duck_arrow = con.execute(oracles[name]).arrow()
            ocols = duck_arrow.schema.names
            orows = list(zip(*(c.to_pylist() for c in duck_arrow.columns)))
            if sorted(scols) != sorted(ocols):
                bad.append(name)
                print(f"{name}: SCHEMA MISMATCH spark={sorted(scols)} duck={sorted(ocols)}")
                continue
            assert_type_families(sdf, duck_arrow)
            sms, oms = rows_to_ms(srows, scols), rows_to_ms(orows, ocols)
            if sms != oms:
                bad.append(name)
                if len(sms) != len(oms):
                    print(f"{name}: ROWCOUNT MISMATCH spark={len(sms)} duck={len(oms)}")
                else:
                    i = next(i for i, (a, b) in enumerate(zip(sms, oms)) if a != b)
                    print(f"{name}: VALUE MISMATCH at sorted-row {i}:\n  spark={sms[i]}\n  duck ={oms[i]}")
            else:
                print(f"{name}: OK {len(sms)} rows ({time.time()-t0:.1f}s)")
        except Exception as e:  # noqa: BLE001
            bad.append(name)
            print(f"{name}: ERROR {type(e).__name__}: {str(e)[:500]}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
