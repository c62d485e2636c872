"""ANN quality: IVF recall vs the exact brute-force baseline."""

from __future__ import annotations

from lens_sds_batch_spark.operators.similarity import ivf_knn, knn_bruteforce

from .conftest import SF_SMOKE


def test_ivf_recall_against_bruteforce(spark):
    exact = {(r["qid"], r["vec_id"]) for r in knn_bruteforce(spark, SF_SMOKE).collect()}
    approx = {(r["qid"], r["vec_id"]) for r in ivf_knn(spark, SF_SMOKE).collect()}
    # nprobe=2/16 cells: expect meaningful recall, not perfection
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.2, f"IVF recall collapsed: {recall}"
    # every returned neighbor must be a real corpus vector with rank info
    assert all(qid != vid for qid, vid in approx)


def test_ivf_sampled_fit_branch_recall(spark, monkeypatch):
    """Force the sampled-fit path (corpus > IVF_FIT_CAP) that the real
    SFs only hit at sf0.1+: with the quantizer trained on ~100 of 500
    vectors, the index must still return real neighbors at meaningful
    recall — the branch is exercised end-to-end, not dead code."""
    from lens_sds_batch_spark.operators import similarity

    monkeypatch.setattr(similarity, "IVF_FIT_CAP", 100)
    exact = {(r["qid"], r["vec_id"]) for r in knn_bruteforce(spark, SF_SMOKE).collect()}
    approx = {(r["qid"], r["vec_id"]) for r in ivf_knn(spark, SF_SMOKE).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.2, f"sampled-fit IVF recall collapsed: {recall}"
    assert all(qid != vid for qid, vid in approx)


def test_assign_cells_matches_kmeans_transform(spark):
    """r7: ivf_knn assigns through the shared stateless projection
    instead of model.transform — pin that assign_cells reproduces the
    ML model's argmin-Euclidean assignment exactly on the smoke
    embeddings (ties break to the lowest cell index in both)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    from lens_sds_batch_spark.operators.similarity import _vecs, assign_cells
    from .conftest import SF_SMOKE

    vecs = _vecs(spark, SF_SMOKE)
    ml = vecs.withColumn("features", array_to_vector("v"))
    model = KMeans(k=8, seed=42, maxIter=8, featuresCol="features", predictionCol="cell").fit(ml)
    centers = [[float(x) for x in c] for c in model.clusterCenters()]
    want = {(r["vec_id"], r["cell"]) for r in model.transform(ml).select("vec_id", "cell").collect()}
    got = {(r["vec_id"], r["cell"]) for r in assign_cells(vecs, centers).select("vec_id", "cell").collect()}
    assert got == want


def test_assign_cells_rejects_malformed_vectors(spark):
    """r8 (ADVICE): a NULL vector or one with the wrong dimension must
    RAISE (as model.transform would) instead of silently landing in
    cell 0 via the all-NULL-scores → negk fallthrough."""
    import pytest

    from lens_sds_batch_spark.operators.similarity import assign_cells

    centers = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]
    ok = spark.createDataFrame([(1, [0.9, 0.1, 0.0])], "vec_id int, v array<double>")
    assert assign_cells(ok, centers).collect()[0]["cell"] == 0

    for bad_rows in ([(2, None)], [(3, [1.0, 2.0])]):
        bad = spark.createDataFrame(bad_rows, "vec_id int, v array<double>")
        with pytest.raises(Exception, match="assign_cells"):
            assign_cells(bad, centers).collect()


def test_assign_cells_preserves_caller_temp_column(spark):
    """A caller column named like the operator's scratch column must
    survive untouched (advisor r9: the fixed name was silently
    clobbered and dropped from the output)."""
    from lens_sds_batch_spark.operators.similarity import assign_cells

    df = spark.createDataFrame(
        [(1, [0.0, 0.1], "keep-me")], "vec_id int, v array<double>, __assign_best string"
    )
    out = assign_cells(df, [[0.0, 0.0], [1.0, 1.0]])
    row = out.collect()[0]
    assert row["__assign_best"] == "keep-me"
    assert row["cell"] == 0
