"""Delta MERGE fast-path execution probe (VERDICT r8 #4).

``plans/merge.py::merge_into`` has two branches under ONE contract: the
Delta ``MERGE INTO`` fast path and the portable parquet write-swap.
The sandbox ships no delta-spark, so the Delta branch is otherwise only
condition-simulated (pytest monkeypatching + the r8 null-safe/total-
ordering proofs).  This test flips it to EXECUTED the moment the
dependency appears: it probes for ``delta``, and when present runs the
real branch in a SUBPROCESS (a Delta session needs
``spark.sql.extensions`` + catalog configs at session-creation time,
which the shared test fixture doesn't carry — in-process the existing
SparkContext would win and the extension silently wouldn't load) and
differentials it against the parquet fallback on the same inputs:
tombstones, exact order ties (target must win), NULL order values
(oldest in both branches), fresh inserts, and delete-of-absent-key.
"""

from __future__ import annotations

import subprocess
import sys

import pytest

_CHILD = r"""
import json, sys
from delta import configure_spark_with_delta_pip
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from lens_sds_batch_spark.plans.merge import merge_into

tmp = sys.argv[1]
builder = (
    SparkSession.builder.master("local[4]")
    .appName("delta-merge-probe")
    .config("spark.sql.extensions", "io.delta.sql.DeltaSparkSessionExtension")
    .config(
        "spark.sql.catalog.spark_catalog",
        "org.apache.spark.sql.delta.catalog.DeltaCatalog",
    )
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
)
spark = configure_spark_with_delta_pip(builder).getOrCreate()

# target: k1 pri=5 (tie case), k2 pri=NULL (NULL-oldest case), k3 pri=2
# (tombstone case), k5 pri=9 (stale-update case)
target_rows = [("k1", 5, "t1"), ("k2", None, "t2"), ("k3", 2, "t3"), ("k5", 9, "t5")]
schema = "k string, pri int, payload string"
tgt_delta = f"{tmp}/tgt_delta"
tgt_parquet = f"{tmp}/tgt_parquet"
cur = spark.createDataFrame(target_rows, schema).withColumn("dead", F.lit(False))
cur.write.format("delta").save(tgt_delta)
cur.write.parquet(tgt_parquet)

# updates: tie on k1 (pri=5 -> target kept), non-NULL beats NULL on k2,
# tombstone k3 (pri=7 > 2 -> key gone), insert k4, stale update k5
# (pri=1 < 9 -> ignored), delete-of-absent k6 (insert suppressed),
# NULL-pri update on k1 (older than anything -> ignored)
upd_rows = [
    ("k1", 5, "u1-tie", False),
    ("k1", None, "u1-null", False),
    ("k2", 3, "u2", False),
    ("k3", 7, "u3", True),
    ("k4", 1, "u4", False),
    ("k5", 1, "u5-stale", False),
    ("k6", 8, "u6", True),
]
upd = spark.createDataFrame(upd_rows, schema + ", dead boolean")

res_d = merge_into(spark, tgt_delta, upd, keys=["k"], order_cols=["pri"],
                   is_delete=F.col("dead"))
res_p = merge_into(spark, tgt_parquet, upd, keys=["k"], order_cols=["pri"],
                   is_delete=F.col("dead"))
assert res_d["engine"] == "delta", res_d
assert res_p["engine"] == "parquet-swap", res_p

# r11: the bucketed portable layout must land on the same Delta-contract
# state as real MERGE INTO (the bucketed path is the portable mirror of
# Delta's file-level rewrite — differential it the moment delta exists)
tgt_bucketed = f"{tmp}/tgt_bucketed"
cur.write.parquet(tgt_bucketed)
res_b = merge_into(spark, tgt_bucketed, upd, keys=["k"], order_cols=["pri"],
                   is_delete=F.col("dead"), num_buckets=4)
assert res_b["engine"] == "parquet-swap" and res_b["num_buckets"] == 4, res_b
res_b2 = merge_into(spark, tgt_bucketed, upd, keys=["k"], order_cols=["pri"],
                    is_delete=F.col("dead"))
assert res_b2["engine"] == "parquet-bucketed", res_b2
got_b = sorted(map(tuple, spark.read.parquet(tgt_bucketed)
                   .select("k", "pri", "payload").collect()))

# r12: the manifest-commit flavor joins the differential too (it is the
# object-store-safe portable mirror of the Delta log's atomic commit)
from lens_sds_batch_spark.plans.merge import read_merged_table

tgt_manifest = f"{tmp}/tgt_manifest"
merge_into(spark, tgt_manifest, cur, keys=["k"], order_cols=["pri"],
           is_delete=F.col("dead"), num_buckets=4, protocol="manifest")
res_m = merge_into(spark, tgt_manifest, upd, keys=["k"], order_cols=["pri"],
                   is_delete=F.col("dead"))
assert res_m["engine"] == "parquet-manifest", res_m
got_m = sorted(map(tuple, read_merged_table(spark, tgt_manifest)
                   .select("k", "pri", "payload").collect()))

got_d = sorted(map(tuple, spark.read.format("delta").load(tgt_delta)
                   .select("k", "pri", "payload").collect()))
got_p = sorted(map(tuple, spark.read.parquet(tgt_parquet)
                   .select("k", "pri", "payload").collect()))
expect = sorted([
    ("k1", 5, "t1"),      # exact tie: target wins in both branches
    ("k2", 3, "u2"),      # non-NULL supersedes NULL-ordered target
    ("k4", 1, "u4"),      # fresh insert
    ("k5", 9, "t5"),      # stale update ignored
    # k3 tombstoned; k6 delete-of-absent never inserts
])
assert got_d == expect, f"delta branch state: {got_d}"
assert got_p == expect, f"parquet branch state: {got_p}"
assert got_b == expect, f"bucketed branch state: {got_b}"
assert got_m == expect, f"manifest branch state: {got_m}"

# r13: evolve_schema(add=...) joins the differential — the Delta branch
# delegates to ALTER TABLE ... ADD COLUMNS; all four flavors must agree
# on NULL backfill for old rows and on a post-evolve merge that carries
# the new column
from lens_sds_batch_spark.plans.merge import evolve_schema

# widen on Delta is Delta's own typeWidening feature — must refuse
try:
    evolve_schema(spark, tgt_delta, widen={"pri": "bigint"})
    raise AssertionError("Delta widen did not refuse")
except ValueError as e:
    assert "typeWidening" in str(e), e

ev2 = spark.createDataFrame(
    [("k4", 10, "u4-note", False, "hello")], schema + ", dead boolean, note string"
)
for t in (tgt_delta, tgt_parquet, tgt_bucketed, tgt_manifest):
    r = evolve_schema(spark, t, add={"note": "string"})
    assert r["added"] == ["note"], (t, r)
    merge_into(spark, t, ev2, keys=["k"], order_cols=["pri"],
               is_delete=F.col("dead"))

expect2 = sorted([
    ("k1", 5, "t1", None),
    ("k2", 3, "u2", None),
    ("k4", 10, "u4-note", "hello"),
    ("k5", 9, "t5", None),
])
sel = ["k", "pri", "payload", "note"]
got2 = {
    "delta": sorted(map(tuple, spark.read.format("delta").load(tgt_delta)
                        .select(*sel).collect())),
    "parquet": sorted(map(tuple, spark.read.parquet(tgt_parquet)
                          .select(*sel).collect())),
    "bucketed": sorted(map(tuple, read_merged_table(spark, tgt_bucketed)
                           .select(*sel).collect())),
    "manifest": sorted(map(tuple, read_merged_table(spark, tgt_manifest)
                           .select(*sel).collect())),
}
for flavor, got in got2.items():
    assert got == expect2, f"post-evolve {flavor} state: {got}"
print("DELTA_MERGE_OK " + json.dumps({"delta": got_d, "parquet": got_p}))
"""


def test_merge_into_delta_branch_executes(tmp_path):
    pytest.importorskip(
        "delta",
        reason="delta-spark is not installed in this environment; the Delta "
        "MERGE INTO fast path in plans/merge.py::merge_into runs for real "
        "the moment `pip install delta-spark` succeeds (until then the "
        "parquet write-swap branch carries the tested contract)",
    )
    p = subprocess.run(
        [sys.executable, "-c", _CHILD, str(tmp_path)],
        capture_output=True, text=True, check=False, timeout=600,
    )
    assert p.returncode == 0, f"stdout:\n{p.stdout[-2000:]}\nstderr:\n{p.stderr[-2000:]}"
    assert "DELTA_MERGE_OK" in p.stdout
