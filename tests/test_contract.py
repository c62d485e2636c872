"""Driver-contract self-checks: registration consistency and the
external-session defense (cheap guards against future drift)."""

from __future__ import annotations

import __spark_entry__ as entry_mod
from lens_sds_batch_spark.sources import parquet as load_table_mod


def test_registry_consistency():
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    # every oracle belongs to a registered query
    assert set(oracles) <= set(qs)
    # flagship + uuid5 flavor registered, BOTH oracle-paired (uuid5
    # since r5: non-hash columns + id well-formedness flags)
    assert "odm_commands" in oracles
    assert "odm_commands_uuid5" in qs and "odm_commands_uuid5" in oracles
    # the whole registry is oracle-paired — a regression to rows-only
    # silently weakens the CORRECTNESS gate, so make it loud
    assert set(oracles) == set(qs), f"rows-only rows reappeared: {set(qs) - set(oracles)}"
    # all builders are callables with the (spark, sf_dir) arity
    for name, fn in qs.items():
        assert callable(fn), name
    # no accidental duplicates between plans and operators
    assert len(qs) == len(set(qs))


def test_engine_confs_reassert_on_load(spark):
    """The driver hands us ITS session: loading any table must force the
    engine-critical runtime confs (UTC + nanosAsLong) even if the
    session was built without them."""
    from lens_sds_batch_spark.sources.parquet import load_events, load_table

    from .conftest import SF_SMOKE

    old_tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
        load_table(spark, SF_SMOKE, "orders")
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
        assert spark.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "true"
        # and the events table is actually readable again
        assert load_events(spark, SF_SMOKE).limit(1).count() == 1
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)


def test_load_table_memoizes_relation_per_session(spark):
    """r14-opt: load_table reuses the source relation within a session
    (metadata/plan reuse — no repeated file listing + footer inference
    per call), while distinct paths stay distinct and the memo never
    caches rows (the returned frame is a plain lazy parquet scan)."""
    from .conftest import SF_SMOKE

    a = load_table_mod.load_table(spark, SF_SMOKE, "orders")
    b = load_table_mod.load_table(spark, SF_SMOKE, "orders")
    assert a is b  # same immutable lazy plan, no re-listing
    c = load_table_mod.load_table(spark, SF_SMOKE, "customer")
    assert c is not a
    # self-join through the shared relation still resolves (Spark's
    # dataset-id disambiguation) and computes real rows
    j = a.join(b.select("o_orderkey"), "o_orderkey").limit(1)
    assert j.count() == 1
    # rows are NOT cached: the plan is a bare parquet scan (no
    # InMemoryRelation anywhere in the analyzed plan)
    assert "InMemoryRelation" not in a._jdf.queryExecution().analyzed().toString()


def test_load_table_memoizes_source_tables_only(spark, tmp_path):
    """r15 (VERDICT r14 #3): the relation memo's read-only contract.
    The memo freezes the file listing at first read, so it must only
    ever serve the static source tables — a name outside TABLES gets a
    fresh read every call (no stale listing if the path is rewritten
    in-session), and nothing the engine writes is ever memoized."""
    from .conftest import SF_SMOKE

    # 1) non-TABLES names bypass the memo entirely
    p = tmp_path / "scratch.parquet"
    spark.range(3).write.parquet(str(p))
    a = load_table_mod.load_table(spark, str(tmp_path), "scratch")
    b = load_table_mod.load_table(spark, str(tmp_path), "scratch")
    assert a is not b
    assert all(k[1] != str(p) for k in load_table_mod._RELATION_MEMO)
    # and a rewrite of the path is visible to the next load (the exact
    # stale-listing hazard the contract closes)
    spark.range(5).write.mode("overwrite").parquet(str(p))
    assert load_table_mod.load_table(spark, str(tmp_path), "scratch").count() == 5
    # 2) every memoized key is a TABLES source under its sf_dir
    load_table_mod.load_table(spark, SF_SMOKE, "orders")
    table_paths = {f"{t}.parquet" for t in load_table_mod.TABLES}
    assert load_table_mod._RELATION_MEMO  # orders is in it
    for _, path in load_table_mod._RELATION_MEMO:
        assert path.rsplit("/", 1)[-1] in table_paths, path


def test_events_ts_physical_type(spark):
    """Loud canary for testdata drift: the driver's events.parquet `ts`
    physical type changed between rounds (TIMESTAMP(NANOS) r1-2 →
    TIMESTAMP(MICROS, isAdjustedToUTC=false) r3+), which broke a third
    of the contract in r3.  If it shifts again, fail HERE with the
    dtype printed, not deep inside 10 operators."""
    import os

    import pyarrow.parquet as pq

    from lens_sds_batch_spark.sources.parquet import load_events

    handled = {"long", "integer", "timestamp", "timestamp_ntz"}
    checked = 0
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        path = f"/root/testdata/{sf}/events.parquet"
        if not os.path.exists(path):
            continue
        checked += 1
        arrow_t = pq.read_schema(path).field("ts").type
        ev = load_events(spark, f"/root/testdata/{sf}")
        spark_t = ev.schema["ts_ns"].dataType.typeName()
        assert spark_t == "long", (
            f"{sf}: ts_ns must be BIGINT, got {spark_t} (parquet ts = {arrow_t})"
        )
        raw_t = spark.read.parquet(path).schema["ts"].dataType.typeName()
        assert raw_t in handled, (
            f"{sf}: events.parquet ts reads as unhandled Spark type {raw_t!r} "
            f"(parquet physical type {arrow_t}) — teach load_events this case"
        )
    assert checked > 0, "no /root/testdata/sf* dirs found — canary checked nothing"


def test_all_queries_analyze(spark):
    """Contract canary: ANALYZE (df.schema) every registry builder at
    sf0.001 in one session.  The r3 break was an analysis-time cast
    error that silently poisoned 10 CORRECTNESS rows + the bench; this
    catches any future loader/type drift in seconds without executing a
    single job."""
    from .conftest import SF_SMOKE

    failures = {}
    for name, fn in entry_mod.queries().items():
        try:
            df = fn(spark, SF_SMOKE)
            assert len(df.schema.fields) > 0
        except Exception as e:  # noqa: BLE001
            failures[name] = f"{type(e).__name__}: {str(e)[:200]}"
    assert not failures, f"{len(failures)} builders fail analysis: {failures}"


def test_load_events_integral_fastpath_equivalence(spark, tmp_path):
    """Both physical flavors the testdata has shipped must canonicalize
    to IDENTICAL ts_ns: TIMESTAMP(NANOS) (read as int64 under
    nanosAsLong -> bigint fast-path) vs TIMESTAMP(MICROS, ntz) (the
    unix_micros conversion path).  Writes the same instants both ways
    with pyarrow and diffs the loader output — pins the branch the
    current testdata never exercises."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lens_sds_batch_spark.sources.parquet import load_events

    micros = [1704067200_000_000, 1704070800_123_456, 1706659032_194_062]
    cols = {
        "event_id": pa.array([1, 2, 3], pa.int64()),
        "user_id": pa.array([10, 20, 30], pa.int64()),
        "event_type": pa.array(["a", "b", "c"]),
        "value": pa.array([1.0, 2.0, 3.0], pa.float64()),
        "props": pa.array(["{}", "{}", "{}"]),
    }
    d_nanos = tmp_path / "nanos"
    d_ntz = tmp_path / "ntz"
    for d, ts_arr in (
        (d_nanos, pa.array([m * 1000 for m in micros], pa.timestamp("ns"))),
        (d_ntz, pa.array(micros, pa.timestamp("us"))),
    ):
        d.mkdir()
        t = pa.table({"event_id": cols["event_id"], "ts": ts_arr, **{
            k: v for k, v in cols.items() if k != "event_id"}})
        pq.write_table(t, str(d / "events.parquet"))

    a = load_events(spark, str(d_nanos))
    b = load_events(spark, str(d_ntz))
    # the nanos file must actually take the integral fast-path
    assert spark.read.parquet(str(d_nanos / "events.parquet")).schema["ts"].dataType.typeName() == "long"
    got_a = {r["event_id"]: r["ts_ns"] for r in a.collect()}
    got_b = {r["event_id"]: r["ts_ns"] for r in b.collect()}
    want = {i + 1: m * 1000 for i, m in enumerate(micros)}
    assert got_a == want
    assert got_b == want


def test_tpch_arm_registry_matches_pack(spark):
    """TPCH_ARMS is the single source the attribution tool measures; a
    pack arm missing from it would be silently invisible to the
    super-linear-arm audit (and vice versa, a registry entry the pack
    dropped would record a stale arm).  Pin kinds == registry keys."""
    from lens_sds_batch_spark.operators.relational import TPCH_ARMS, tpch_pack

    from .conftest import SF_SMOKE

    kinds = {r["kind"] for r in tpch_pack(spark, SF_SMOKE).select("kind").distinct().collect()}
    # q7 (disjunctive nation-pair predicate) and q11 (value > total/1500
    # threshold) are legitimately EMPTY at sf0.001 — both arms are
    # non-empty and hash-green at the sf0.01 driver gate — so their
    # kinds can be absent here, but nothing else may be, and no kind
    # may exist outside the registry.
    assert kinds <= set(TPCH_ARMS)
    assert set(TPCH_ARMS) - kinds <= {"q7", "q11"}


def test_pack_arms_individually_importable(spark):
    """Registry-headroom contract (COVERAGE.md): every operator folded
    into a pack stays a NAMED, importable, independently callable
    function — the fold is a schema cast, not a merge — so any pack can
    be unfolded back into standalone registrations without rewriting."""
    from .conftest import SF_SMOKE

    ARM_FUNCS = {
        "lens_sds_batch_spark.operators.relational": [
            # joins_pack
            "join_semi", "join_anti", "join_outer_counts", "join_full_outer",
            "join_cross", "range_join",
            # window_pack / agg_multi_pack / set_ops_pack
            "window_running_sum", "window_funcs_pack", "window_range_frame",
            "agg_distinct", "agg_cube", "agg_grouping_sets",
            "set_intersect", "set_except", "set_except_all",
            # row_funcs / scalar / percentile / reshape / tpch / time_aggs
            "string_funcs2", "date_parts", "scalar_funcs", "array_funcs_pack",
            "json_funcs_pack", "percentile_exact", "percentile_multi",
            "pivot_status_priority", "unpivot_part",
            "q4_order_priority", "q10_returned_items", "topk_global",
            "q17_small_quantity_revenue", "q18_large_volume_customers",
            "q21_sole_late_supplier", "q20_part_promotion_suppliers",
            "q22_dormant_balance_customers",
            "q2_min_cost_supplier", "q9_product_type_profit",
            "q16_supplier_part_counts",
            "events_sliding", "cohort_retention",
            # r13 fold: both former registry packs stay callable arms
            "agg_multi_pack", "percentile_pack",
            # r14 fold: both former registry packs stay callable arms
            "reshape_pack", "set_ops_pack",
        ],
        # r6 folds: dedup_basic_pack + knn_pack + textstats_pack arms
        # stay independently callable
        "lens_sds_batch_spark.operators.dedup": [
            "ngram_jaccard_pairs", "dedup_exact", "dedup_fingerprint",
        ],
        "lens_sds_batch_spark.operators.textops": [
            "text_quality", "token_counts", "rolling_hash", "pii_scrub",
            # r11 fold: both former registry packs stay callable arms
            "textstats_pack", "term_stats_pack",
            # r12: corpus-unigram LM score joins doc_features_pack
            "lm_score",
        ],
        "lens_sds_batch_spark.operators.similarity": [
            "embedding_dup_pairs", "knn_bruteforce", "knn_lsh_bucketed",
        ],
    }
    import importlib

    for mod_name, funcs in ARM_FUNCS.items():
        mod = importlib.import_module(mod_name)
        for fn_name in funcs:
            fn = getattr(mod, fn_name)  # AttributeError = a fold lost its arm
            df = fn(spark, SF_SMOKE)
            assert df.columns, f"{fn_name} produced no schema"
            df.explain(mode="simple")  # analyzes the plan without executing


def test_probe_coverage_is_total_and_enforced(monkeypatch):
    """r10 verdict #6: power probes are colocated with each module's
    QUERIES and aggregated by registry.all_probes(), which must (a)
    cover every registered query plus the two flagships, and (b) FAIL
    LOUDLY if a query ships probe-less — simulated here by blanking one
    module's PROBES."""
    import pytest

    from lens_sds_batch_spark.operators import dedup, registry

    probes = registry.all_probes()
    covered = {q for (q, _, _) in probes.values()}
    expected = set(registry.all_queries()) | {"odm_commands", "odm_commands_uuid5"}
    assert covered == expected
    # every probe is well-formed SQL-bearing spec
    for name, (query, kind, sql) in probes.items():
        assert kind in ("corpus", "oracle") and "SELECT" in sql.upper(), name
        if kind == "oracle":
            assert "FROM t" in sql, f"{name}: oracle probe must read FROM t"

    monkeypatch.setattr(dedup, "PROBES", {})
    with pytest.raises(ValueError, match="NO power probe"):
        registry.all_probes()


def test_rank_math_percentile_equals_builtin(spark):
    """rank_math_percentiles (the r14-opt replacement for the buffering
    exact `percentile()` aggregate inside approx_sketches) must return
    BIT-IDENTICAL doubles to the builtin on randomized data with heavy
    ties and NULLs — the interpolation mirrors Percentile.getPercentile
    term-for-term, so equality is exact, not approximate."""
    import random

    from pyspark.sql import functions as F

    from lens_sds_batch_spark.operators.relational import (
        rank_math_percentiles,
    )

    rng = random.Random(1405)
    rows = []
    # None group key: a REAL group for the builtin (and for window
    # partitioning) — must survive the helper's internal joins
    for g in ["A", "B", "C", "D", None]:
        n = rng.choice([1, 2, 7, 100, 1001])
        for _ in range(n):
            # coarse grid => many exact ties; ~10% NULLs
            v = None if rng.random() < 0.1 else round(rng.uniform(0, 50), 1)
            rows.append((g, v))
    # one fully-tied group (every value identical: the mass-tie bucket
    # short-circuit) and a two-point group
    rows += [("T", 7.0)] * 500 + [("U", 1.0), ("U", 2.0)]
    rows.append(("E", None))  # all-NULL group: builtin yields NULL
    df = spark.createDataFrame(rows, "g string, v double")

    ps = [(0.0, "p00"), (0.25, "p25"), (0.45, "p45"), (0.5, "p50"),
          (0.55, "p55"), (0.9, "p90"), (1.0, "p100")]
    builtin = df.groupBy("g").agg(
        *[F.expr(f"percentile(v, {p})").alias(a) for p, a in ps]
    )
    ours = rank_math_percentiles(df, "g", "v", ps)

    b = {r["g"]: r for r in builtin.collect()}
    o = {r["g"]: r for r in ours.collect()}
    assert set(b) == set(o) | {"E"}  # all-NULL group absent from ours
    assert b["E"]["p50"] is None
    for g, row in o.items():
        for _p, a in ps:
            assert row[a] == b[g][a], (g, a, row[a], b[g][a])
