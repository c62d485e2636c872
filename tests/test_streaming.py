"""Streaming semantics tests (B9): dedupe-by-deterministic-id
(exactly-once effect), windowed aggregation, foreachBatch merge."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from lens_sds_batch_spark.streaming.pipeline import (
    dedupe_stream,
    read_event_stream,
    run_to_memory,
    windowed_counts,
)

from .conftest import SF_SMOKE


@pytest.fixture()
def stream_dir(spark, tmp_path):
    """Two files with overlapping event_ids — simulated at-least-once
    redelivery.  Source timestamps are nanos (see load_events); rewrite
    to micros timestamps for the stream."""
    from lens_sds_batch_spark.sources.parquet import load_events

    src = (
        load_events(spark, SF_SMOKE)
        .withColumn("ts", F.expr("timestamp_micros(ts_ns div 1000)"))
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
        .limit(200)
    )
    d = str(tmp_path / "stream")
    src.where(F.col("event_id") < 150).coalesce(1).write.parquet(d)
    # second delivery overlaps [100, 150) — replayed ids
    src.where((F.col("event_id") >= 100) & (F.col("event_id") < 200)).coalesce(1).write.mode(
        "append"
    ).parquet(d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_stream_dedupe_exactly_once_effect(spark, stream_dir):
    stream = read_event_stream(spark, stream_dir, max_files_per_trigger=1)
    q = run_to_memory(dedupe_stream(stream), "deduped")
    try:
        got = spark.sql("SELECT count(*) AS n, count(DISTINCT event_id) AS d FROM deduped").collect()[0]
        assert got["n"] == got["d"] == 200  # replayed ids collapsed
    finally:
        q.stop()


def test_stream_windowed_counts_match_batch(spark, stream_dir):
    stream = read_event_stream(spark, stream_dir, max_files_per_trigger=2)
    q = run_to_memory(
        windowed_counts(dedupe_stream(stream), watermark=None), "win", output_mode="append"
    )
    try:
        # append mode only emits closed windows; check subset-consistency
        batch = (
            spark.read.parquet(stream_dir)
            .dropDuplicates(["event_id"])
            .groupBy(F.date_trunc("hour", "ts").alias("window_start"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        streamed = spark.sql("SELECT window_start, event_type, n FROM win")
        joined = streamed.alias("s").join(
            batch.alias("b"),
            (F.col("s.window_start") == F.col("b.window_start"))
            & (F.col("s.event_type") == F.col("b.event_type")),
        )
        mismatched = joined.where(F.col("s.n") != F.col("b.n"))
        assert mismatched.count() == 0
    finally:
        q.stop()


def test_foreach_batch_lww_merge(spark, stream_dir, tmp_path):
    """foreachBatch sink applying the LWW merge per micro-batch."""
    from lens_sds_batch_spark.plans.merge import apply_lww

    out = str(tmp_path / "state")
    stream = read_event_stream(spark, stream_dir, max_files_per_trigger=1)

    def merge_batch(batch_df, epoch_id):
        merged = apply_lww(
            batch_df,
            keys=["user_id"],
            order_cols=[F.col("ts"), F.col("event_id")],
            is_delete=F.lit(False),
        )
        merged.write.mode("append").parquet(out)

    q = stream.writeStream.foreachBatch(merge_batch).start()
    q.processAllAvailable()
    q.stop()
    # every user appearing in the source has at least one state row
    users_src = {r[0] for r in spark.read.parquet(stream_dir).select("user_id").distinct().collect()}
    users_out = {r[0] for r in spark.read.parquet(out).select("user_id").distinct().collect()}
    assert users_src == users_out


def test_stateful_user_counts(spark, stream_dir):
    """applyInPandasWithState accumulates per-user counts across
    micro-batches (update mode: last emitted row per user = total)."""
    from lens_sds_batch_spark.streaming.pipeline import stateful_user_counts

    stream = read_event_stream(spark, stream_dir, max_files_per_trigger=1)
    q = run_to_memory(stateful_user_counts(stream), "ustate", output_mode="update")
    try:
        # last update per user must equal the raw (with-duplicates) count
        final = spark.sql(
            """SELECT user_id, max(n_events) AS n FROM ustate GROUP BY user_id"""
        )
        raw = (
            spark.read.parquet(stream_dir)
            .groupBy("user_id")
            .count()
            .withColumnRenamed("count", "expected")
        )
        joined = final.join(raw, "user_id")
        bad = joined.where(F.col("n") != F.col("expected"))
        assert bad.count() == 0
        assert final.count() == raw.count()
    finally:
        q.stop()
