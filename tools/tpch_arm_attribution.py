"""Per-arm 1x/100x attribution for tpch_pack (r9 verdict #3).

The pack's 100x smoke ratio (7.7, the largest in the table) is a sum
over its arms (20 since r10) — a single super-linear arm could hide
inside it.  This
tool reuses scale_smoke's replicated corpus and times each arm
INDIVIDUALLY (noop sink, same measurement window as the smoke), then
prints per-arm base/scaled seconds and ratios, worst first.

Usage: python tools/tpch_arm_attribution.py [k] [sf_dir] [arm,arm,...]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from scale_smoke import build_scaled  # noqa: E402

from lens_sds_batch_spark.operators.relational import TPCH_ARMS as ARMS  # noqa: E402
from lens_sds_batch_spark.session import get_spark  # noqa: E402

# Only the tables tpch arms actually read; build_scaled skips the (large,
# irrelevant) documents/embeddings replication and the events table.
TPCH_TABLES = {"customer", "orders", "lineitem"}


def time_arms(spark, sf_dir: str, arms) -> dict[str, float]:
    out = {}
    for name in arms:
        t0 = time.time()
        ARMS[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        out[name] = round(time.time() - t0, 2)
    return out


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    arms = list(ARMS)
    if len(sys.argv) > 3:
        arms = sys.argv[3].split(",")
        unknown = [a for a in arms if a not in ARMS]
        if unknown:
            raise SystemExit(f"unknown arms: {unknown}; known: {sorted(ARMS)}")
    spark = get_spark("tpch-arm-attribution")
    spark.sparkContext.setLogLevel("ERROR")
    scaled_dir = build_scaled(spark, sf_dir, k, tables=TPCH_TABLES)
    time_arms(spark, sf_dir, arms)  # warm JVM/codegen before measuring
    base = time_arms(spark, sf_dir, arms)
    spark.catalog.clearCache()
    # Two passes, keep the min: the first read of the freshly-written
    # scaled corpus pays cold page-cache I/O that is not the arm's cost
    # (measured r10: q12's first pass read 17.2 s, warm 6.1 — the cold
    # read would have mis-attributed a 2.8x "regression" to the join).
    s1 = time_arms(spark, scaled_dir, arms)
    s2 = time_arms(spark, scaled_dir, arms)
    scaled = {a: min(s1[a], s2[a]) for a in arms}
    rows = sorted(
        ((a, base[a], scaled[a], round(scaled[a] / max(base[a], 0.01), 1)) for a in arms),
        key=lambda r: -r[3],
    )
    print(f"{'arm':<12} {'base':>7} {f'{k}x':>8} {'ratio':>6}")
    for a, b, s, r in rows:
        print(f"{a:<12} {b:>7.2f} {s:>8.2f} {r:>6.1f}")
    print(json.dumps({"k": k, "base": base, "scaled": scaled}))
    spark.stop()
    import shutil

    shutil.rmtree(scaled_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
