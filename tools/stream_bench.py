"""Streaming throughput / per-trigger latency bench (r10 verdict #5).

Streaming has correctness parity (stream ≡ batch pinned for every
stateful operator in tests/test_streaming.py) but had no recorded
performance point.  This tool measures the three executing streaming
paths at sf0.1 event volume (~100k events) on the sandbox's
file-stream transport:

- ``correlate_stream``: per-cid first-event-wins stateful correlation
  (applyInPandasWithState) through a noop sink.
- ``lww_sink``: the foreachBatch LWW merge sink (apply_lww per
  micro-batch, parquet append) — the command-sink path.
- ``requeue_loop``: the nack+requeue fixpoint (requeue_sink pointed at
  the stream's own source dir), drained to quiescence — throughput
  includes the feedback redeliveries.

Each bench reports rows in, wall-clock of processAllAvailable, rows/s,
trigger count, and median per-trigger latency (durationMs.
triggerExecution from the query progress log).  Prints ONE JSON line.

r12 (VERDICT r11 #5): the r11 numbers were trigger-overhead-bound
floors (8 triggers over 100k rows).  A third argument ``repeat``
replicates the event source K times (event_ids offset per copy so keys
stay unique where they should; correlation ids get a per-copy suffix so
the stateful operator's state actually GROWS with volume), letting each
trigger carry production-shaped row counts.  The correlate bench
additionally reports the state-store row series across triggers
(first/peak/last numRowsTotal + total removed) — the watermark-eviction
bound on state growth, observed rather than asserted.

Measurement discipline (BASELINE.md): single readings drift ±30% on
this host — record the MEDIAN of 3 fresh-process runs, same as the
batch table.

Usage: python tools/stream_bench.py [sf_dir] [files_per_trigger] [repeat]
"""

from __future__ import annotations

import json
import shutil
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from lens_sds_batch_spark.session import get_spark  # noqa: E402

BASE_TMP = "/tmp/lens_stream_bench"
N_SRC_FILES = 16


def _progress_stats(q) -> tuple[int, float]:
    """(triggers, median triggerExecution ms) over data-bearing triggers."""
    durs = [
        p.durationMs["triggerExecution"]
        for p in q.recentProgress  # StreamingQueryProgress, dict-like
        if (p.numInputRows or 0) > 0
    ]
    return len(durs), (statistics.median(durs) if durs else 0.0)


def _state_series(q) -> dict:
    """Per-trigger state-store numRowsTotal series (first/peak/last)
    plus total evicted rows — the observable watermark bound: a
    steady-state stream's 'last' must sit far below 'rows in' once
    eviction fires."""
    totals, removed = [], 0
    for p in q.recentProgress:
        for so in p.stateOperators or []:
            totals.append(so.numRowsTotal)
            removed += so.numRowsRemoved or 0
    if not totals:
        return {}
    return {
        "state_rows_first": totals[0],
        "state_rows_peak": max(totals),
        "state_rows_last": totals[-1],
        "state_rows_removed": removed,
    }


def _replicate(df, repeat: int, id_col: str, suffix_col: str | None = None):
    """K stacked copies: ``id_col`` offset per copy (unique keys across
    copies), ``suffix_col`` (a string key) suffixed per copy so
    per-key STATE multiplies with volume instead of collapsing."""
    if repeat <= 1:
        return df
    span = 1 << 40  # far above any event_id in the corpus
    parts = []
    for i in range(repeat):
        c = df.withColumn(id_col, F.col(id_col) + F.lit(i * span))
        if suffix_col is not None:
            c = c.withColumn(
                suffix_col, F.concat(F.col(suffix_col), F.lit(f"_{i}"))
            )
        parts.append(c)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def bench_correlate(
    spark, sf_dir: str, fpt: int, repeat: int = 1, ordered: bool = False
) -> dict:
    from lens_sds_batch_spark.streaming.pipeline import correlate_stream

    src = f"{BASE_TMP}/corr_src"
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    base = ev.select(
        F.concat(F.lit("C"), F.col("user_id").cast("string")).alias("cid"),
        F.col("ts").cast("timestamp").alias("ts"),
        F.col("event_id").cast("bigint").alias("seq"),
        F.col("event_type").alias("name"),
    )
    # suffix cid per copy: distinct correlation groups, so STATE scales
    # with volume (same-cid copies would collapse into one state row)
    repl = _replicate(base, repeat, "seq", suffix_col="cid")
    # ordered=True writes the source files TIME-ORDERED (range partition
    # on ts), so each trigger advances event-time monotonically and the
    # watermark actually passes group timeouts — the eviction curve
    # becomes observable.  The default random layout makes every
    # trigger span the whole time range (watermark jumps to max-2h on
    # trigger 1 and nothing times out until the stream ends), which
    # shows the state BOUND (distinct groups) but not the eviction.
    writer = (
        repl.repartitionByRange(N_SRC_FILES, "ts")
        if ordered
        else repl.repartition(N_SRC_FILES)
    )
    n = (
        writer.write.mode("overwrite").parquet(src)
        or spark.read.parquet(src).count()
    )
    stream = (
        spark.readStream.schema("cid string, ts timestamp, seq bigint, name string")
        .option("maxFilesPerTrigger", fpt)
        .parquet(src)
    )
    q = (
        correlate_stream(stream, watermark="2 hours")
        .writeStream.format("noop")
        .outputMode("update")
        .start()
    )
    t0 = time.time()
    q.processAllAvailable()
    wall = time.time() - t0
    triggers, med = _progress_stats(q)
    state = _state_series(q)
    q.stop()
    return {"rows": n, "wall_sec": round(wall, 2),
            "rows_per_sec": round(n / wall), "triggers": triggers,
            "median_trigger_ms": med, **state}


def bench_sustained(
    spark,
    fpt: int,
    duration_sec: int = 300,
    rows_per_tick: int = 20_000,
    groups_per_tick: int = 2_000,
    tick_interval: float = 1.0,
) -> dict:
    """Sustained-run state-store ceiling observation (r12; NOTES r13
    candidate #3): a rate-limited feeder appends ONE source file per
    tick while ``correlate_stream`` runs continuously, with event-time
    advancing ONE HOUR per tick under a 2-hour watermark — so every
    tick's correlation groups become evictable ~2-3 ticks later and
    steady-state state is TIME-bounded (the last few ticks' live
    groups), never volume-bounded.  The drain-mode benches show the
    eviction curve over a finite corpus; this one shows the property
    that matters for a weeks-long production stream: rows processed
    grows linearly while state rows AND state-store memory PLATEAU.

    The per-trigger series is accumulated by polling ``lastProgress``
    from the feeder loop (``recentProgress`` caps at ~100 entries —
    a minutes-long run overflows it).  Headline numbers: global peak
    vs last-third peak of state rows and of ``memoryUsedBytes`` (a
    plateau reads as last-third-peak ~= global peak while
    ``rows_fed`` keeps growing), total evicted rows, and sustained
    rows/s (feed-rate-bound by design — capacity is the drain-mode
    benches' number)."""
    from lens_sds_batch_spark.streaming.pipeline import correlate_stream

    src = f"{BASE_TMP}/sus_src"
    names = "started,progressed,completed,failed".split(",")

    def tick_df(tick: int):
        # fresh cids per tick (state turns over); event-time = epoch
        # start + tick hours, spread over the hour so the watermark
        # (max ts - 2h) lands mid-window rather than on a boundary
        return (
            spark.range(rows_per_tick)
            .select(
                F.concat(
                    F.lit(f"T{tick}_"), (F.col("id") % groups_per_tick).cast("string")
                ).alias("cid"),
                (
                    F.lit(1_600_000_000 + tick * 3600) + (F.col("id") % 3600)
                ).cast("timestamp").alias("ts"),
                (F.lit(tick) * rows_per_tick + F.col("id")).alias("seq"),
                F.element_at(
                    F.array(*[F.lit(n) for n in names]),
                    (F.col("id") % len(names) + 1).cast("int"),
                ).alias("name"),
            )
        )

    tick_df(0).coalesce(1).write.mode("overwrite").parquet(src)  # seed
    stream = (
        spark.readStream.schema("cid string, ts timestamp, seq bigint, name string")
        .option("maxFilesPerTrigger", fpt)
        .parquet(src)
    )
    q = (
        correlate_stream(stream, watermark="2 hours")
        .writeStream.format("noop")
        .outputMode("update")
        .start()
    )
    series: dict[int, tuple[int, int, int]] = {}  # batchId -> (rows, mem, removed)

    def poll():
        p = q.lastProgress
        if not p:
            return
        for so in p.get("stateOperators") or []:
            series[p["batchId"]] = (
                so["numRowsTotal"],
                so["memoryUsedBytes"],
                so.get("numRowsRemoved") or 0,
            )

    t0 = time.time()
    tick = 1
    while time.time() - t0 < duration_sec:
        next_due = t0 + tick * tick_interval
        tick_df(tick).coalesce(1).write.mode("append").parquet(src)
        tick += 1
        poll()
        delay = next_due - time.time()
        if delay > 0:
            time.sleep(delay)
    q.processAllAvailable()  # drain the tail so the last poll is final
    poll()
    wall = time.time() - t0
    q.stop()

    rows_fed = tick * rows_per_tick
    ordered = [series[b] for b in sorted(series)]
    if not ordered:  # ADVICE r12: a duration too short for any micro-batch
        # to complete leaves the lastProgress-fed series empty — report
        # cleanly instead of max() on an empty sequence
        return {
            "duration_sec": round(wall, 1),
            "ticks_fed": tick,
            "rows_fed": rows_fed,
            "triggers_observed": 0,
            "note": "no streaming progress observed — run longer than one "
                    "micro-batch (raise duration_sec)",
        }
    state_rows = [r for r, _, _ in ordered]
    mem = [m for _, m, _ in ordered]
    cut = (2 * len(ordered)) // 3
    return {
        "duration_sec": round(wall, 1),
        "ticks_fed": tick,
        "rows_fed": rows_fed,
        "rows_per_sec_sustained": round(rows_fed / wall),
        "triggers_observed": len(ordered),
        "state_rows_peak": max(state_rows),
        "state_rows_last_third_peak": max(state_rows[cut:]),
        "state_rows_last": state_rows[-1],
        "state_mem_peak_bytes": max(mem),
        "state_mem_last_third_peak_bytes": max(mem[cut:]),
        "state_rows_removed": sum(d for _, _, d in ordered),
        "groups_per_tick": groups_per_tick,
    }


def bench_lww_sink(spark, sf_dir: str, fpt: int, repeat: int = 1) -> dict:
    from lens_sds_batch_spark.plans.merge import apply_lww
    from lens_sds_batch_spark.streaming.pipeline import read_event_stream

    src = f"{BASE_TMP}/lww_src"
    out = f"{BASE_TMP}/lww_state"
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ev = _replicate(ev, repeat, "event_id")
    n = (
        ev.repartition(N_SRC_FILES).write.mode("overwrite").parquet(src)
        or spark.read.parquet(src).count()
    )
    stream = read_event_stream(spark, src, max_files_per_trigger=fpt)

    def merge_batch(batch_df, _epoch):
        apply_lww(
            batch_df,
            keys=["user_id"],
            order_cols=[F.col("ts"), F.col("event_id")],
            is_delete=F.lit(False),
        ).write.mode("append").parquet(out)

    q = stream.writeStream.foreachBatch(merge_batch).start()
    t0 = time.time()
    q.processAllAvailable()
    wall = time.time() - t0
    triggers, med = _progress_stats(q)
    q.stop()
    return {"rows": n, "wall_sec": round(wall, 2),
            "rows_per_sec": round(n / wall), "triggers": triggers,
            "median_trigger_ms": med}


def bench_requeue(spark, sf_dir: str, fpt: int, repeat: int = 1) -> dict:
    from lens_sds_batch_spark.operators.cdc import (
        _RQ_FAIL_MOD,
        _RQ_FATAL_MOD,
        _RQ_MAX_ATTEMPTS,
    )
    from lens_sds_batch_spark.sources.parquet import load_events
    from lens_sds_batch_spark.streaming.pipeline import requeue_sink

    src, out, dead = (f"{BASE_TMP}/rq_{d}" for d in ("src", "out", "dead"))
    # full sf0.1 event volume (the batch query's _RQ_SUBSET_MOD exists
    # only to keep the DuckDB oracle's fixpoint CTE tractable)
    ev = _replicate(
        load_events(spark, sf_dir).select("event_id", F.lit(0).alias("attempts")),
        repeat, "event_id",
    )
    n = (
        ev.repartition(N_SRC_FILES)
        .write.mode("overwrite")
        .parquet(src)
        or spark.read.parquet(src).count()
    )
    att = F.coalesce(F.col("attempts"), F.lit(0))
    sink = requeue_sink(
        out, dead, src,
        is_ok=att >= F.col("event_id") % _RQ_FAIL_MOD,
        is_retryable=F.col("event_id") % _RQ_FATAL_MOD != 0,
        max_attempts=_RQ_MAX_ATTEMPTS,
    )
    q = (
        spark.readStream.schema("event_id bigint, attempts int")
        .option("maxFilesPerTrigger", fpt)
        .parquet(src)
        .writeStream.foreachBatch(sink)
        .start()
    )
    t0 = time.time()
    q.processAllAvailable()  # drains feedback redeliveries to fixpoint
    wall = time.time() - t0
    triggers, med = _progress_stats(q)
    q.stop()
    routed = spark.read.parquet(out).count() + spark.read.parquet(dead).count()
    return {"rows": n, "rows_routed": routed, "wall_sec": round(wall, 2),
            "rows_per_sec": round(n / wall), "triggers": triggers,
            "median_trigger_ms": med}


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "sustained":
        # usage: stream_bench.py sustained [duration_sec] [fpt]
        duration = int(sys.argv[2]) if len(sys.argv) > 2 else 300
        fpt = int(sys.argv[3]) if len(sys.argv) > 3 else 4
        shutil.rmtree(BASE_TMP, ignore_errors=True)
        spark = get_spark("stream-bench")
        spark.sparkContext.setLogLevel("ERROR")
        print(json.dumps({
            "metric": "sustained streaming state-store ceiling",
            "files_per_trigger": fpt,
            "benches": {"correlate_sustained": bench_sustained(spark, fpt, duration)},
        }))
        shutil.rmtree(BASE_TMP, ignore_errors=True)
        return
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    fpt = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    repeat = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    ordered = len(sys.argv) > 4 and sys.argv[4] == "ordered"
    shutil.rmtree(BASE_TMP, ignore_errors=True)
    spark = get_spark("stream-bench")
    spark.sparkContext.setLogLevel("ERROR")
    if ordered:  # eviction-curve observation: correlate only
        benches = {
            "correlate_stream": bench_correlate(spark, sf_dir, fpt, repeat, True),
        }
    else:
        benches = {
            "correlate_stream": bench_correlate(spark, sf_dir, fpt, repeat),
            "lww_sink": bench_lww_sink(spark, sf_dir, fpt, repeat),
            "requeue_loop": bench_requeue(spark, sf_dir, fpt, repeat),
        }
    print(json.dumps({
        "metric": "streaming rows/sec + per-trigger latency",
        "files_per_trigger": fpt,
        "repeat": repeat,
        "ordered": ordered,
        "benches": benches,
        "sf_dir": sf_dir,
    }))
    shutil.rmtree(BASE_TMP, ignore_errors=True)


if __name__ == "__main__":
    main()
