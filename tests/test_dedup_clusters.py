"""Invariants for near-dup clustering (connected components over the
minhash pair graph) beyond the oracle hash check in test_oracle_parity:
the structural properties a dedup consumer relies on."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lens_sds_batch_spark.operators.dedup import dedup_clusters, dedup_minhash_pairs

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def clusters(spark):
    return dedup_clusters(spark, SF_SMOKE).collect()


def test_one_canonical_per_cluster(clusters):
    by_cluster: dict[int, list] = {}
    for r in clusters:
        by_cluster.setdefault(r.cluster_id, []).append(r)
    assert by_cluster, "expected at least one non-singleton cluster in the fixture"
    for cid, members in by_cluster.items():
        canon = [m for m in members if m.is_canonical == 1]
        assert len(canon) == 1, f"cluster {cid}: {len(canon)} canonicals"
        # the canonical IS the cluster id, and it's the min member
        assert canon[0].doc_id == cid == min(m.doc_id for m in members)
        # recorded size matches actual membership
        assert all(m.cluster_size == len(members) for m in members)


def test_clusters_match_transitive_closure(spark, clusters):
    """Driver-side union-find over the raw pairs must produce the same
    partition of nodes (independent re-derivation, not the same join
    pipeline)."""
    pairs = dedup_minhash_pairs(spark, SF_SMOKE).select("doc_a", "doc_b").collect()
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for p in pairs:
        ra, rb = find(p.doc_a), find(p.doc_b)
        if ra != rb:
            # union by min so the representative is the min id
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo
    expected = {x: find(x) for x in parent}
    got = {r.doc_id: r.cluster_id for r in clusters}
    assert got == expected
