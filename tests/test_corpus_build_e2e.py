"""Capstone integration: the full corpus-build user story chained
end-to-end — quality gate → exact dedup (keep-first) → train/valid/
test split + shard assignment → partitioned write — then the OUTPUT
artifact is read back and its invariants checked.  Individual stages
are oracle-paired elsewhere; this pins that they COMPOSE into a valid
training corpus on disk, the thing a user of the engine actually
ships."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from lens_sds_batch_spark.operators.curation import N_SHARDS, corpus_shuffle_split
from lens_sds_batch_spark.operators.textops import corpus_filter
from lens_sds_batch_spark.sources.parquet import load_table

from .conftest import SF_SMOKE


def test_corpus_build_end_to_end(spark, tmp_path):
    out = str(tmp_path / "corpus")
    docs = load_table(spark, SF_SMOKE, "documents")

    kept = corpus_filter(spark, SF_SMOKE).select("doc_id")
    gated = docs.join(kept, "doc_id")
    # exact dedup, keep-first: one canonical doc per text
    survivors = (
        gated.groupBy("text").agg(F.min("doc_id").alias("doc_id"))
        .join(docs.select("doc_id", "lang", "source"), "doc_id")
    )
    assign = corpus_shuffle_split(spark, SF_SMOKE).select("doc_id", "shuffle_key", "shard", "split")
    curated = survivors.join(assign, "doc_id")
    (
        curated.repartition("split")
        .sortWithinPartitions("shuffle_key")
        .write.partitionBy("split")
        .mode("overwrite")
        .parquet(out)
    )

    # artifact invariants
    back = spark.read.parquet(out)
    n_gate = kept.count()
    n_out = back.count()
    assert 0 < n_out <= n_gate  # dedup only removes
    # split dirs exist and partition-prune
    dirs = {d for d in os.listdir(out) if d.startswith("split=")}
    assert dirs <= {"split=train", "split=valid", "split=test"} and "split=train" in dirs
    # no duplicate text survived into the artifact
    assert back.groupBy("text").count().where(F.col("count") > 1).count() == 0
    # splits are disjoint and complete over the artifact's docs
    per_doc = back.groupBy("doc_id").agg(F.count_distinct("split").alias("k"))
    assert per_doc.where(F.col("k") != 1).count() == 0
    # shard assignment is within range and deterministic vs the op
    assert back.where((F.col("shard") < 0) | (F.col("shard") >= N_SHARDS)).count() == 0
    re_assign = {r["doc_id"]: (r["shard"], r["split"]) for r in assign.collect()}
    for r in back.select("doc_id", "shard", "split").collect():
        assert re_assign[r["doc_id"]] == (r["shard"], r["split"])
