"""Multimodal plumbing tests (B10/B11): the fake-codec pipeline's
Arrow batch shapes, determinism, and shuffle-free physical plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from lens_sds_batch_spark.operators.multimodal import (
    FRAME_STRIDE,
    N_FEATURES,
    extract_media_features,
    media_table,
)

from .conftest import SF_SMOKE


def test_extract_media_features_shapes(spark):
    media = media_table(spark, SF_SMOKE)
    out = extract_media_features(media)
    rows = out.collect()
    assert len(rows) == media.count()
    for r in rows:
        assert len(r["features"]) == N_FEATURES
        assert all(0.0 <= v <= 255.0 for v in r["features"])
        if r["media_type"].startswith("video"):
            # every FRAME_STRIDE-th frame of n_frames, starting at 0
            assert r["sampled_frames"] == list(range(0, r["n_frames"], FRAME_STRIDE))
        else:
            assert r["sampled_frames"] == []


def test_extract_media_features_deterministic(spark):
    media = media_table(spark, SF_SMOKE)
    a = {r["doc_id"]: (r["features"], r["sampled_frames"]) for r in extract_media_features(media).collect()}
    b = {r["doc_id"]: (r["features"], r["sampled_frames"]) for r in extract_media_features(media).collect()}
    assert a == b


def test_extract_media_features_no_shuffle(spark):
    """The decode→pool→sample stage must stay per-partition: no Exchange
    in the executed plan (at 100 TB a shuffle of raw media bytes is the
    single most expensive wrong move; r14-opt re-confirmed — a gated
    fan-out was tried and measured SLOWER than the vectorized decode)."""
    out = extract_media_features(media_table(spark, SF_SMOKE))
    out.foreach(lambda _: None)  # execute without driver collect
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "ArrowEvalPython" in plan or "MapInPandas" in plan


def test_features_join_embeddings_grain(spark):
    """Feature vectors land at doc grain and join the embeddings table
    1:1 — the handoff point between media pipeline and ANN index."""
    feats = extract_media_features(media_table(spark, SF_SMOKE)).select("doc_id", "features")
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    n_docs = feats.count()
    joined = feats.join(emb, feats.doc_id == emb.vec_id, "left")
    assert joined.count() == n_docs
