"""sf1-grain value-divergence sweep (r10 verdict #2).

The dual-SF oracle sweep (sf0.01 gate + sf0.1 full-registry hash
verification) excludes value-level scale divergence only up to sf0.1.
This tool pushes the VALUE-SENSITIVE subset one decade further:
it builds a key-consistent 10x replication of sf0.1 (~6M lineitem —
the sf1 grain; facts replicated with stride-offset keys, dims fixed,
documents near-duplicated — scale_smoke.build_scaled, the repo's
sanctioned scaled-corpus builder) and runs the full gate compare
(drive_driver.compare_one: schema + type families + value multiset
vs DuckDB) on the queries whose outputs aggregate enough rows for
decimal-boundary / tie-stability bugs to first appear at this grain.

This is also where the BHJ->SMJ flip and AQE skew handling run on
real (non-identical-copy) volumes, so per-query wall-clock is printed
alongside each verdict for NOTES.md.

Usage: python tools/sf1_divergence.py [queries,comma,separated]
(default: the value-sensitive subset named by the r10 verdict).
Writes the scaled corpus under /tmp/lens_scale_smoke (re-created,
removed on success).  Runtime: tens of minutes — the DuckDB side of
tpch_pack's correlated-subquery arms dominates.
"""

from __future__ import annotations

import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402

from lens_sds_batch_spark.session import get_spark  # noqa: E402
from tools.scale_smoke import BASE_TMP, build_scaled  # noqa: E402

DEFAULT = (
    "tpch_pack", "odm_commands", "percentile_pack",
    "dedup_minhash_pairs", "dup_pairs_pack", "agg_multi_pack",
)

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

# Queries whose sf1-grain output is too large to collect (the gate's
# compare_one collects BOTH sides into Python — odm_commands emits
# ~2.5M x 14 string columns here, past spark.driver.maxResultSize).
# These compare by ENGINE-SIDE DIGEST instead: count(*) plus the sum of
# a 48-bit integer parsed from each row's md5 over the canonicalized
# sorted-column payload.  Exact for all-string outputs (no float
# formatting is involved — asserted), order-insensitive, and
# multiplicity-sensitive (equal multisets <=> equal count + hash-sum,
# modulo md5 collision).
DIGEST = {"odm_commands"}

_SEP = "\x1f"
_NULL = "<NULL>"
_HEXPOS = "0123456789abcdef"


def _digest_compare(con, spark, name, fn, sql, sf_dir) -> bool:
    from pyspark.sql import functions as F

    t0 = time.time()
    sdf = fn(spark, sf_dir)
    types = dict(sdf.dtypes)
    cols = sorted(sdf.columns)
    assert all(types[c] == "string" for c in cols), (
        f"{name}: digest compare is only exact for all-string outputs, "
        f"got {types}"
    )
    payload = F.concat_ws(
        _SEP, *[F.coalesce(F.col(c), F.lit(_NULL)) for c in cols]
    )
    srow = (
        sdf.select(F.md5(payload).alias("h"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.conv(F.substring("h", 1, 12), 16, 10).cast("decimal(38,0)"))
            .alias("s"),
        )
        .collect()[0]
    )
    t_spark = time.time() - t0

    dpayload = f" || '{_SEP}' || ".join(
        f"coalesce(CAST({c} AS VARCHAR), '{_NULL}')" for c in cols
    )
    # DuckDB v1.0 has no hex->int cast; parse 12 nibbles positionally
    nib = " + ".join(
        f"(strpos('{_HEXPOS}', substr(h, {i}, 1)) - 1) * {16 ** (12 - i)}::HUGEINT"
        for i in range(1, 13)
    )
    drow = con.execute(
        f"SELECT count(*), sum({nib}) FROM "
        f"(SELECT md5({dpayload}) AS h FROM ({sql}))"
    ).fetchone()
    t_duck = time.time() - t0 - t_spark
    ok = (srow["n"], int(srow["s"])) == (drow[0], int(drow[1]))
    print(
        f"{name}: {'OK' if ok else 'MISMATCH'} digest "
        f"spark=({srow['n']}, {srow['s']}) duck=({drow[0]}, {drow[1]}) "
        f"(spark {t_spark:.1f}s, duck {t_duck:.1f}s)",
        flush=True,
    )
    return ok


def main():
    names = sys.argv[1].split(",") if len(sys.argv) > 1 else list(DEFAULT)
    import __spark_entry__ as em
    from tools.drive_driver import compare_one

    qs, oracles = em.queries(), em.oracle_sql()
    unknown = set(names) - set(qs)
    if unknown:
        raise SystemExit(f"unknown queries: {sorted(unknown)}")

    spark = get_spark("sf1-divergence")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    scaled = build_scaled(spark, "/root/testdata/sf0.1", 10)
    print(f"built 10x sf0.1 corpus in {time.time() - t0:.0f}s", flush=True)

    con = duckdb.connect()
    for t in TABLES:
        # scaled fact tables are parquet DIRECTORIES; dims are single files
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{scaled}/{t}.parquet/*.parquet', union_by_name=false)"
            if __import__("os").path.isdir(f"{scaled}/{t}.parquet")
            else f"CREATE VIEW {t} AS SELECT * FROM '{scaled}/{t}.parquet'"
        )

    failures = []
    for name in names:
        t1 = time.time()
        if name in DIGEST:
            ok = _digest_compare(con, spark, name, qs[name], oracles[name], scaled)
        else:
            ok = compare_one(con, spark, name, qs[name], oracles[name], sf_dir=scaled)
        print(f"  [{name}] total {time.time() - t1:.0f}s", flush=True)
        if not ok:
            failures.append(name)
    print(f"\n=== sf1 sweep: {len(names) - len(failures)}/{len(names)} OK; "
          f"failures: {failures}")
    if not failures:
        shutil.rmtree(BASE_TMP, ignore_errors=True)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
