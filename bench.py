"""Benchmark runner (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is fully materialized through the `noop` sink (forces every
column/row to be computed without count()-style pruning shortcuts).
"""

from __future__ import annotations

import json
import os
import time

from lens_sds_batch_spark.session import get_spark


HEADLINE = (
    "odm_commands",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_nation_revenue",
    "window_topk_per_group",
    "agg_rollup",
    "events_tumbling",
    "sessionize",
    "asof_join",
    "merge_lww",
    "correlate_first_event",
    # r6: dedup_basic_pack folds the former dedup_exact +
    # dedup_fingerprint rows (its time stands in for the two combined)
    "dedup_basic_pack",
    "dedup_minhash_pairs",
    # r6: knn_pack folds the former knn_bruteforce + knn_lsh_bucketed
    # rows (one pack = both arms executed, so for subset comparability
    # its time stands in for the two former entries combined)
    "knn_pack",
    # r6: textstats_pack folded the former text_quality + token_counts
    # rows; r7 added rolling_hash; r11 folded textstats_pack +
    # term_stats_pack into text_pack — this ONE row now stands in for
    # the five former entries combined
    "text_pack",
    "multimodal_meta",
    "entity_state_subjects",
    "scd2_history",
    "session_window_agg",
    "simhash_dup_pairs",
    "embedding_quantize_int8",
    "media_chunks",
    "salted_hot_key_agg",
    # added round 2 (keys above are the r1-comparable suite — 28 rows
    # originally; pack folds since then mean subset totals compare only
    # loosely: each pack row carries its folded arms' work)
    "stratified_sample",
    "pack_sequences",
    # added round 3
    "dedup_clusters",
    "corpus_shuffle_split",
    # added round 4: the expensive pack queries were previously
    # invisible to the per-round perf record (dup_pairs_pack measured
    # 12s before its r4 sort fix — unbenchmarked); totals before r4 are
    # comparable on the key subsets above only
    "dup_pairs_pack",
    "doc_features_pack",
    "cdc_guard_pack",
    "joins_pack",
    "ivf_knn",
    # added round 6
    "curation_funnel",
    "layout_zorder",
    # late r6: the rest of the registry — bench now covers EVERY
    # contract query (the r4 lesson: an unbenchmarked query hid a 12s
    # regression).  Totals are r1/r4-comparable on the key subsets
    # above only; per-query rows are the real record.
    "odm_commands_uuid5",
    "media_decode_stub",
    "window_pack",
    # r13: agg_multi_pack + percentile_pack folded into agg_percentile_pack
    "agg_percentile_pack",
    # r12: scalar_pack + row_funcs_pack folded into row_scalar_pack
    "row_scalar_pack",
    # r14: set_ops_pack + reshape_pack folded into shape_ops_pack
    "shape_ops_pack",
    "tpch_pack",
    "time_aggs_pack",
    "approx_sketches",
    # added round 8: the XML ingestion path (render harness + scan +
    # executor-side parse + dead-letter route); the render write runs in
    # the builder, the binaryFile scan + parse in the exec phase
    "odm_xml_ingest",
    # added round 9: the requeue loop driven to fixpoint in batch — the
    # sink epochs (route + append + feedback rename) run in the builder,
    # the final routed read in the exec phase
    "requeue_routing",
    # added round 10: the skew-stressed salted JOIN (banked slot from
    # the term_stats_pack fold)
    "skew_salted_join",
    # added round 11: the bucketed merge_into gate query (banked slot
    # from the text_pack fold)
    "entity_state_bucketed",
    # added round 12: the manifest-commit merge flavor + rebucket +
    # vacuum under the gate (banked slot from the row_scalar_pack fold)
    "entity_state_manifest",
    # added round 13: explicit schema evolution (add + widen) across the
    # manifest merge protocol under the gate (banked slot from the
    # agg_percentile_pack fold)
    "schema_evolution",
    # added round 14: the dedup cap/drop telemetry (banked slot from the
    # shape_ops_pack fold)
    "dedup_coverage",
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    spark = get_spark("lens-sds-batch-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    from __spark_entry__ import queries

    qs = queries()
    # warm the JVM/codegen/parquet-footer paths so the first timed query
    # isn't charged the session cold-start (measured ~3-5s of noise)
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(1000).groupBy(
        "l_returnflag"
    ).count().write.format("noop").mode("overwrite").save()
    # failure-isolated: a broken query becomes an {"err": ...} row, the
    # suite JSON always prints (round 3 lost its entire perf signal when
    # one analysis error aborted the whole run)
    timings: dict[str, object] = {}
    errors = 0
    # "queries" keeps the r1-r4 measurement window (builder excluded,
    # execution through the noop sink) so per-query numbers stay
    # comparable across rounds and against BASELINE.md.  "build_sec"
    # (r5) separately reports the builder-call wall-clock, which is NOT
    # noise for every query: dedup_clusters runs its iterative label
    # propagation eagerly in the builder (~6s at sf0.1), ivf_knn fits
    # KMeans, tfidf counts the corpus, and odm_commands pays ~4s of
    # driver-side plan construction/analysis — work the old JSON never
    # surfaced anywhere.
    builds: dict[str, float] = {}
    for name in HEADLINE:
        try:
            builder = qs[name]
            b0 = time.perf_counter()
            df = builder(spark, sf_dir)
            builds[name] = round(time.perf_counter() - b0, 3)
            start = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            timings[name] = round(time.perf_counter() - start, 2)
        except Exception as e:  # noqa: BLE001
            errors += 1
            timings[name] = {"err": f"{type(e).__name__}: {str(e)[:300]}"}

    total = round(sum(t for t in timings.values() if isinstance(t, (int, float))), 2)
    # The driver records only the LAST 2000 chars of stdout; r5 lost its
    # machine-readable record (BENCH_r05.json parsed: null) because the
    # per-query build_sec dict pushed the line past that window.  The
    # stdout contract line therefore stays minimal (2dp, build_total
    # only); the full build_sec detail goes to a sidecar file + stderr.
    out = {
        "metric": "headline-suite wall-clock (exec; +build_total sec of builder work)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "build_total": round(sum(builds.values()), 2),
        "sf": sf,
    }
    if errors:
        out["errors"] = errors
    line = json.dumps(out)
    # the sidecar carries the FULL record (incl. per-query exec timings
    # and any err dicts) so even the aggregate-only stdout fallback
    # below loses nothing machine-readable (r6 review)
    detail = {"build_sec": builds, "queries": timings, "stdout_line_len": len(line)}
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"), "w") as f:
            json.dump(detail, f, indent=1)
    except OSError:
        pass
    import sys

    print(json.dumps(detail), file=sys.stderr)
    if len(line) > 1900:
        # never let the contract line outgrow the capture window again:
        # drop to the aggregate-only form rather than emit an unparseable
        # record
        out.pop("queries")
        out["queries_dropped_for_length"] = True
        line = json.dumps(out)
    print(line)
    spark.stop()
    if errors:
        # the suite JSON above still prints (the r3 lesson), but a
        # broken query must not read as a faster suite + success rc
        raise SystemExit(1)


if __name__ == "__main__":
    main()
