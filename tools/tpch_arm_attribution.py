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

from lens_sds_batch_spark.operators import relational as R  # noqa: E402
from lens_sds_batch_spark.session import get_spark  # noqa: E402

ARMS = {
    "q4": R.q4_order_priority,
    "q10": R.q10_returned_items,
    "topk_part": R.topk_global,
    "q6": R.q6_forecast_revenue,
    "q12": R.q12_late_priority_counts,
    "q14": R.q14_promo_revenue,
    "q19": R.q19_disjunctive_revenue,
    "q17": R.q17_small_quantity_revenue,
    "q18": R.q18_large_volume_customers,
    "q21": R.q21_sole_late_supplier,
    "q20": R.q20_part_promotion_suppliers,
    "q22": R.q22_dormant_balance_customers,
    "q7": R.q7_volume_shipping,
    "q8": R.q8_market_share,
    "q13": R.q13_customer_distribution,
    "q15": R.q15_top_supplier,
    "q11": R.q11_important_parts,
    "q2": R.q2_min_cost_supplier,
    "q9": R.q9_product_type_profit,
    "q16": R.q16_supplier_part_counts,
}


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
        arms = [a for a in sys.argv[3].split(",") if a in ARMS]
    spark = get_spark("tpch-arm-attribution")
    spark.sparkContext.setLogLevel("ERROR")
    scaled_dir = build_scaled(spark, sf_dir, k)
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


if __name__ == "__main__":
    main()
