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
