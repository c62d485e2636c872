"""Scale-pattern proofs: bucketed co-located joins (no shuffle on the
bucketed side) and streaming checkpoint-restart (B9 replay contract)."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from .conftest import SF_SMOKE


def test_bucketed_join_eliminates_shuffle(spark, tmp_path):
    """Bucketing lineitem+orders on orderkey co-locates the join: the
    physical plan must contain NO Exchange over the bucketed scans
    (SortMergeJoin reads buckets directly) — the 100 TB fact-fact join
    strategy."""
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").option(
        "path", str(tmp_path / "li_b")
    ).saveAsTable("li_b")
    orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").option(
        "path", str(tmp_path / "ord_b")
    ).saveAsTable("ord_b")
    # force a sort-merge join (at real scale neither side broadcasts)
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = (
            spark.table("li_b")
            .join(spark.table("ord_b"), F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        got = {tuple(r) for r in j.collect()}  # execute -> final AQE plan
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "SelectedBucketsCount" in plan  # bucketed scans in use
        # the join inputs themselves must be exchange-free
        assert "Exchange hashpartitioning(l_orderkey" not in plan
        assert "Exchange hashpartitioning(o_orderkey" not in plan
        # and results match the plain join
        expected = (
            li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        assert got == {tuple(r) for r in expected.collect()}
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS ord_b")


def test_aqe_skew_join_splits_hot_partition(spark):
    """AQE skew-join: a join against a table where one key holds ~50% of
    all rows must get OptimizeSkewedJoin treatment — the hot partition is
    split into multiple tasks instead of one straggler.  This is the
    engine's default answer to skewed natural keys at 100 TB (engine
    confs pin skewJoin.enabled=true; sources/parquet.ensure_engine_confs
    re-asserts them against hostile sessions)."""
    n = 400_000
    # ~half the fact rows land on key 7; dims are made non-broadcastable
    fact = spark.range(n).select(
        F.when((F.col("id") % 2) == 0, F.lit(7)).otherwise(F.col("id") % 1000).alias("k"),
        F.col("id").alias("v"),
    )
    dim = spark.range(1000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("w"))
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    }
    old = {k: spark.conf.get(k) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        j = fact.join(dim, "k").groupBy().agg(F.count(F.lit(1)).alias("n"), F.sum("w").alias("sw"))
        row = j.collect()[0]
        assert row["n"] == n
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan  # AQE split the hot partition
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)


def test_streaming_checkpoint_restart(spark, tmp_path):
    """Kill a deduping stream mid-way, restart from the checkpoint, feed
    the overlap again: the final store still holds each id once
    (at-least-once delivery + deterministic ids = exactly-once effect)."""
    from lens_sds_batch_spark.sources.parquet import load_events
    from lens_sds_batch_spark.streaming.pipeline import dedupe_stream, read_event_stream

    src_dir = str(tmp_path / "src")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    base = (
        load_events(spark, SF_SMOKE)
        .withColumn("ts", F.expr("timestamp_micros(ts_ns div 1000)"))
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
        .limit(300)
    )
    base.where(F.col("event_id") < 200).coalesce(1).write.parquet(src_dir)

    def start():
        stream = read_event_stream(spark, src_dir, max_files_per_trigger=1)
        return (
            dedupe_stream(stream)
            .writeStream.option("checkpointLocation", ckpt)
            .format("parquet")
            .option("path", out_dir)
            .start()
        )

    q = start()
    q.processAllAvailable()
    q.stop()
    # redelivery overlap [100, 300) lands while the stream is DOWN
    base.where(F.col("event_id") >= 100).coalesce(1).write.mode("append").parquet(src_dir)
    q = start()
    q.processAllAvailable()
    q.stop()
    got = spark.read.parquet(out_dir)
    n, d = got.count(), got.select("event_id").distinct().count()
    assert n == d == 300
    shutil.rmtree(src_dir, ignore_errors=True)


def test_partitioned_sink_and_pruning(spark, tmp_path):
    """A7's topic-routed sink: write commands partitioned by name; a
    filtered read must prune partitions (PartitionFilters in the scan,
    only the matching directory touched)."""
    from lens_sds_batch_spark.plans.commands import generate_commands
    from lens_sds_batch_spark.plans.odm import BATCH_CMD_ID, SUB, derive_odm_from_tpch

    out = str(tmp_path / "commands_by_topic")
    odm = derive_odm_from_tpch(spark, SF_SMOKE)
    cmds = generate_commands(odm, BATCH_CMD_ID, SUB, persist=False)
    # routing key = the reference's namespace.name form (broker.clj:121-131)
    cmds.withColumn(
        "topic", F.regexp_replace(F.col("name"), "/", ".")
    ).write.partitionBy("topic").mode("overwrite").parquet(out)

    import os

    dirs = sorted(d for d in os.listdir(out) if d.startswith("topic="))
    assert any("insert-item" in d for d in dirs)
    one = spark.read.parquet(out).where(F.col("topic") == "odm-import.insert-subject")
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(topic" in plan
    got = one.select("name").distinct().collect()
    assert [r["name"] for r in got] == ["odm-import/insert-subject"]


def test_flagship_plan_shapes_pinned(spark):
    """Golden plan-shape snapshots (VERDICT r5 #8): the bench can hide a
    plan regression in noise — a future optimizer/code change that
    introduces a cartesian product, a row-at-a-time Python UDF, or an
    extra sort-merge join into a flagship query should fail HERE, by
    name, not as a vague slowdown.  Bounds are ceilings (a better plan
    may always appear); they pin the r6 shapes at sf0.001:

    - odm_commands: at most 1 SortMergeJoin (the single natural-key
      equi-join; everything else is windows over the same exchange)
    - correlate_first_event: 0 SMJ (command side broadcasts)
    - q1_pricing_summary: pure scan+agg, at most 2 exchanges (partial +
      final agg), no join of any kind
    - every pinned query: 0 CartesianProduct, 0 row-at-a-time Python
      (BatchEvalPython); media_decode_stub stays the ONLY Arrow UDF op
    """
    import __spark_entry__ as em

    from .conftest import SF_SMOKE

    qs = em.queries()

    def plan_of(name):
        return qs[name](spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()

    bounds = {
        # name: (max_smj, max_cartesian, max_row_python)
        "odm_commands": (1, 0, 0),
        "correlate_first_event": (0, 0, 0),
        "q1_pricing_summary": (0, 0, 0),
        "dup_pairs_pack": (2, 0, 0),
        "cdc_guard_pack": (1, 0, 0),
        "doc_features_pack": (2, 0, 0),
    }
    for name, (max_smj, max_cart, max_py) in bounds.items():
        plan = plan_of(name)
        assert plan.count("SortMergeJoin") <= max_smj, (
            f"{name}: {plan.count('SortMergeJoin')} SortMergeJoins (pinned <= {max_smj})"
        )
        assert plan.count("CartesianProduct") <= max_cart, f"{name}: cartesian product appeared"
        assert plan.count("BatchEvalPython") <= max_py, f"{name}: row-at-a-time Python UDF appeared"

    q1 = plan_of("q1_pricing_summary")
    assert q1.count("Exchange") <= 2, f"q1: {q1.count('Exchange')} exchanges (pinned <= 2)"
    assert "Join" not in q1

    # the deliberate Arrow UDF op keeps its zero-exchange shape
    media = plan_of("media_decode_stub")
    assert media.count("MapInPandas") + media.count("ArrowEvalPython") >= 1
    assert media.count("Exchange") == 0, "media_decode_stub grew a shuffle"


def test_zorder_layout_write_and_pruning(spark, tmp_path):
    """layout_zorder's write side: range-repartition + sort by zkey,
    partition the files by zbucket — a filtered read on zbucket must
    prune partitions, and each written file must hold a contiguous
    zkey range (the property that makes row-group min/max stats prune
    scans on EITHER underlying dimension at 100 TB)."""
    import os

    from lens_sds_batch_spark.operators.curation import layout_zorder

    out = str(tmp_path / "docs_zordered")
    keyed = layout_zorder(spark, SF_SMOKE)
    (
        keyed.repartitionByRange(4, "zkey")
        .sortWithinPartitions("zkey")
        .write.partitionBy("zbucket")
        .mode("overwrite")
        .parquet(out)
    )
    assert any(d.startswith("zbucket=") for d in os.listdir(out))

    # partition pruning on the coarse cluster
    buckets = sorted(r["zbucket"] for r in keyed.select("zbucket").distinct().collect())
    one = spark.read.parquet(out).where(F.col("zbucket") == buckets[0])
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(zbucket" in plan
    assert {r["zbucket"] for r in one.select("zbucket").distinct().collect()} == {buckets[0]}

    # contiguity must hold per FILE, not per bucket (bucket ranges are
    # disjoint by construction since zbucket = zkey >> 8 — asserting
    # those would be a tautology, r6 review finding): within a bucket,
    # the per-file [min, max] zkey intervals must not overlap, which is
    # exactly what the repartitionByRange + sortWithinPartitions write
    # buys and what row-group min/max pruning needs.  Without the
    # range repartition, a bucket's files come from arbitrary input
    # splits and their ranges interleave.
    per_file = (
        spark.read.parquet(out)
        .groupBy("zbucket", F.input_file_name().alias("f"))
        .agg(F.min("zkey").alias("lo"), F.max("zkey").alias("hi"))
        .collect()
    )
    by_bucket: dict = {}
    for r in per_file:
        by_bucket.setdefault(r["zbucket"], []).append((r["lo"], r["hi"]))
    multi = 0
    for intervals in by_bucket.values():
        intervals.sort()
        multi += len(intervals) > 1
        for (_, hi_a), (lo_b, _) in zip(intervals, intervals[1:]):
            assert hi_a <= lo_b, "overlapping per-file zkey ranges in one bucket"
    assert multi >= 1  # the multi-file case is actually exercised


def test_skew_salted_join_plan_and_equivalence(spark):
    """skew_salted_join (r10): the salted join must actually take the
    shuffle path it exists to de-skew — SortMergeJoin on (key, salt),
    NOT a broadcast (which would dodge the pattern at test scale) —
    and must produce exactly the plain unsalted join's result."""
    from lens_sds_batch_spark.operators.relational import (
        SKEW_JOIN_DIM_MOD,
        skew_salted_join,
    )
    from lens_sds_batch_spark.sources.parquet import load_table

    salted = skew_salted_join(spark, SF_SMOKE)
    plan = salted._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "BroadcastHashJoin" not in plan
    assert "CartesianProduct" not in plan

    dim = (
        load_table(spark, SF_SMOKE, "supplier")
        .groupBy((F.col("s_suppkey") % SKEW_JOIN_DIM_MOD).alias("dk"))
        .agg(F.min("s_name").alias("dim_tag"))
    )
    fact = load_table(spark, SF_SMOKE, "lineitem").select(
        F.when(F.col("l_orderkey") % 4 != 0, F.lit(1).cast("bigint"))
        .otherwise(F.col("l_orderkey") % SKEW_JOIN_DIM_MOD)
        .alias("hk"),
        F.col("l_quantity").cast("decimal(18,2)").alias("q"),
    )
    plain = (
        fact.join(dim, fact.hk == dim.dk)
        .groupBy("dk", "dim_tag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("q").cast("double").alias("total_qty"),
        )
    )
    got = {tuple(r) for r in salted.collect()}
    want = {tuple(r) for r in plain.collect()}
    assert len(want) > 0 and got == want
    # the hot key really is hot: it must dominate the fact volume
    hot = {r[0]: r[2] for r in got}[1]
    assert hot > sum(n for _, _, n, _ in got) * 0.7

    # salt independence (r11 advice fix): the salt must be uncorrelated
    # with the hot-key predicate — an l_orderkey-mod salt would leave
    # hot rows unable to take salts 0/4/8/12 (4 of 16 build replicas
    # dead).  Recompute the operator's salt expression on the hot rows
    # and require every salt value to actually receive work.
    from lens_sds_batch_spark.operators.relational import SKEW_JOIN_SALT

    hot_salts = (
        load_table(spark, SF_SMOKE, "lineitem")
        .where(F.col("l_orderkey") % 4 != 0)
        .select(
            F.pmod(
                F.xxhash64("l_orderkey", "l_linenumber"), F.lit(SKEW_JOIN_SALT)
            ).alias("salt")
        )
        .distinct()
        .count()
    )
    assert hot_salts == SKEW_JOIN_SALT


def test_runtime_bloom_filter_prunes_fact_side(spark):
    """Runtime bloom-filter join pruning — the 100 TB path of the
    fact-fact SortMergeJoin arms (tpch_pack q9/q21/q4-group): when the
    dim side carries a selective filter and neither side broadcasts,
    Spark injects a bloom_filter_agg on the creation side and a
    might_contain predicate on the fact scan, cutting shuffle volume
    before the SMJ.  At test SFs this never fires on its own because
    the application-side scan is far below the 10 GiB
    applicationSideScanSizeThreshold — exactly the scan size where it
    starts paying off on a cluster — so this test scales the
    threshold to local data and pins (a) the feature is ON by default
    in our session (no action needed at scale), (b) the filter
    actually injects on our join shape, (c) results are identical
    with and without it."""
    assert (
        spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled")
        == "true"
    )
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")

    def q():
        return (
            li.join(
                orders.where(F.col("o_orderpriority") == "1-URGENT"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("o_orderpriority")
            .agg(F.sum("l_quantity").alias("s"))
        )

    old_bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    thresh_key = (
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold"
    )
    old_thresh = spark.conf.get(thresh_key)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        spark.conf.set(thresh_key, "0")
        j = q()
        with_bloom = {tuple(r) for r in j.collect()}
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "might_contain" in plan  # fact side is bloom-pruned
        opt = j._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter_agg" in opt  # creation side builds it

        spark.conf.set(thresh_key, old_thresh)
        j2 = q()
        without = {tuple(r) for r in j2.collect()}
        assert "might_contain" not in (
            j2._jdf.queryExecution().executedPlan().toString()
        )
        assert with_bloom == without and with_bloom
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_bcast)
        spark.conf.set(thresh_key, old_thresh)


def test_dynamic_partition_pruning_via_dim_filter(spark, tmp_path):
    """Dynamic partition pruning — the star-schema 100 TB layout: a
    fact table partitioned by its routing key, joined to a broadcast
    dim whose FILTER (not a literal on the fact) decides which
    partitions matter.  Static pruning (test_partitioned_sink_and_
    pruning) needs the literal on the fact scan; DPP injects the dim
    subquery into the scan's PartitionFilters at runtime, so only the
    matching partition directories are listed and read.  The plan must
    carry the real IN-subquery form — Spark silently degrades to
    dynamicpruningexpression(true) (scan everything) when the
    broadcast isn't reused, which is exactly the regression this test
    exists to catch."""
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    out = str(tmp_path / "orders_by_prio")
    orders.write.partitionBy("o_orderpriority").mode("overwrite").parquet(out)
    fact = spark.read.parquet(out)
    prios = [r[0] for r in orders.select("o_orderpriority").distinct().collect()]
    assert len(prios) == 5
    dim = spark.createDataFrame(
        [(p, "urgent" if p[0] in "12" else "normal") for p in prios],
        "prio string, cls string",
    )
    j = (
        fact.join(
            F.broadcast(dim),
            (F.col("o_orderpriority") == F.col("prio"))
            & (F.col("cls") == "urgent"),
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    got = {tuple(r) for r in j.collect()}
    plan = j._jdf.queryExecution().executedPlan().toString()
    # truncation-proof tokens: the plan printer abbreviates the
    # PartitionFilters bracket at ~100 chars, and once the shared
    # session's expression IDs reach 5 digits the IN-subquery text gets
    # cut mid-token ("IN dynamicpruni...") — so assert the injection via
    # the expression head plus the subquery NODE (printed at line
    # start, never truncated), and reject the degenerate literal-true
    # form (short enough that it always prints whole)
    assert "dynamicpruningexpression(" in plan
    assert "dynamicpruningexpression(true)" not in plan
    assert (
        "SubqueryAdaptiveBroadcast dynamicpruning" in plan
        or "SubqueryBroadcast dynamicpruning" in plan
    )
    # equivalence with the statically-filtered fact
    expected = {
        tuple(r)
        for r in (
            orders.where(F.col("o_orderpriority").substr(1, 1).isin("1", "2"))
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
    }
    assert got == expected and got


def test_aqe_coalesces_overprovisioned_shuffle(spark):
    """AQE partition coalescing — the other half of the session
    factory's at-scale contract (session.py: 'shuffle partitions ...
    on a real cluster AQE coalesces from a deliberately high initial
    number instead').  Over-provision the shuffle 200-wide on a small
    aggregation and pin that the runtime actually collapses it: the
    final plan carries an 'AQEShuffleRead coalesced' node and the
    output partition count lands far below the static setting, so a
    plan tuned for 100 TB doesn't strand a thousand near-empty
    reducers at lower volume."""
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "200")
        j = li.groupBy("l_returnflag").agg(F.sum("l_quantity").alias("s"))
        got = {tuple(r) for r in j.collect()}
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "AQEShuffleRead coalesced" in plan
        assert j.rdd.getNumPartitions() < 200
        assert len(got) == 3  # A/N/R — the aggregation actually ran
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
