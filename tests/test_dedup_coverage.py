"""Crafted-corpus pins for ``dedup_coverage`` (r14, VERDICT r13 #1 —
the no-silent-caps principle's runtime half).

The synthetic driver corpus exercises the minhash/simhash drop paths at
sf0.01 but leaves the jaccard block cap and the probe-reach truncation
at zero (the caps bind only at larger SFs / longer docs) — this corpus
makes every cap bind with hand-derivable counts:

- 201 same-word-count unique-word docs  → one (en, nw DIV 2) block one
  over JACCARD_BLOCK_CAP=200: dropped, all 201 docs deferred.
- 1 doc of 400 distinct words in its own (kept) block → proportional
  probe reach = ((400*10) DIV 7) DIV 2 - 400 DIV 2 = 85 buckets, far
  past JACCARD_PROBE_CAP=32: exactly one truncated doc.
- 101 byte-identical docs → identical minhash signatures AND identical
  simhash fingerprints, so all four band buckets hold 101 members —
  over HOT_BUCKET_CAP=50 and SIMHASH_BLOCK_CAP=100: every band row
  dropped, so all 101 docs are fully DEFERRED in both banded tiers.
- 201 all-positive 4-dim embeddings in one sign bucket (one over
  EMB_BUCKET_CAP=200: dropped), 2 in a second bucket, plus one ZERO
  vector — excluded by the validity layer, so units_total counts 203,
  not 204.

Each tier's counts are asserted against the hand computation and the
whole result against the DuckDB twin (the same compare class the
driver gate runs).
"""

from __future__ import annotations

import duckdb

from lens_sds_batch_spark.operators.dedup import (
    HOT_BUCKET_CAP,
    JACCARD_BLOCK_CAP,
    JACCARD_PROBE_CAP,
    SIMHASH_BLOCK_CAP,
    _duck_coverage_sql,
    dedup_coverage,
)
from lens_sds_batch_spark.operators.similarity import EMB_BUCKET_CAP

N_BLOCK = JACCARD_BLOCK_CAP + 1  # 201: one over the jaccard cap
N_DUP = SIMHASH_BLOCK_CAP + 1  # 101: over both banded caps
LONG_WORDS = 400  # reach 85 > JACCARD_PROBE_CAP
N_EMB_HOT = EMB_BUCKET_CAP + 1  # 201: one over the sign-bucket cap


def _write_crafted(spark, tmp_path) -> str:
    rows = []
    for i in range(N_BLOCK):  # doc_ids 1..201, nw=10 each, unique words
        text = " ".join(f"a{i:03d}x{j}" for j in range(10))
        rows.append((i + 1, text, "en", "crafted", len(text)))
    long_text = " ".join(f"L{j:04d}" for j in range(LONG_WORDS))
    rows.append((300, long_text, "en", "crafted", len(long_text)))
    dup_text = "c0 c1 c2 c3 c4"
    for i in range(N_DUP):  # doc_ids 400..500, byte-identical
        rows.append((400 + i, dup_text, "en", "crafted", len(dup_text)))
    sf_dir = str(tmp_path)
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.parquet(f"{sf_dir}/documents.parquet")
    # embeddings: one hot all-positive sign bucket one over the cap, a
    # small kept bucket, and one zero vector the validity layer excludes
    evs = [
        (i + 1, [1.0, 1.0, 1.0, float(i % 7 + 1)]) for i in range(N_EMB_HOT)
    ]
    evs += [(900, [-1.0, 1.0, -1.0, 1.0]), (901, [-1.0, 1.0, -1.0, 2.0])]
    evs += [(999, [0.0, 0.0, 0.0, 0.0])]  # invalid: zero norm
    spark.createDataFrame(
        evs, "vec_id bigint, embedding array<float>"
    ).write.parquet(f"{sf_dir}/embeddings.parquet")
    return sf_dir


def test_coverage_counts_every_cap_binding(spark, tmp_path):
    sf_dir = _write_crafted(spark, tmp_path)
    cov = {r["tier"]: r.asDict() for r in dedup_coverage(spark, sf_dir).collect()}
    assert set(cov) == {"jaccard", "minhash", "simhash", "emb_cos"}
    n_docs = N_BLOCK + 1 + N_DUP

    # --- jaccard: blocks are (en, 5)x201 [dropped], (en, 200)x1,
    # (en, 2)x101 [both kept]; only the long doc's reach is clipped ---
    j = cov["jaccard"]
    assert j["blocks_total"] == 3
    assert j["blocks_dropped"] == 1
    assert j["units_total"] == n_docs
    assert j["units_dropped"] == N_BLOCK
    assert j["docs_deferred"] == N_BLOCK
    assert ((LONG_WORDS * 10) // 7) // 2 - LONG_WORDS // 2 > JACCARD_PROBE_CAP
    assert j["docs_probe_truncated"] == 1

    # --- minhash: the 101 identical docs share all 4 band buckets
    # (101 > HOT_BUCKET_CAP) — every other doc's buckets are singletons ---
    m = cov["minhash"]
    assert m["units_total"] == 4 * n_docs
    assert m["blocks_dropped"] == 4
    assert m["units_dropped"] == 4 * N_DUP
    assert m["docs_deferred"] == N_DUP
    assert m["docs_probe_truncated"] is None

    # --- simhash: same 4 hot buckets one over SIMHASH_BLOCK_CAP; band
    # values are 16-bit masks, so unrelated docs MAY collide into other
    # buckets — the identical-doc buckets are dropped regardless ---
    s = cov["simhash"]
    assert s["units_total"] == 4 * n_docs
    assert s["blocks_dropped"] >= 4
    assert s["units_dropped"] >= 4 * N_DUP
    assert s["docs_deferred"] >= N_DUP
    assert s["docs_probe_truncated"] is None

    # --- emb_cos: the hot sign bucket (201 all-positive vectors) is
    # one over the cap; the zero vector never reaches the bucketing ---
    e = cov["emb_cos"]
    assert e["blocks_total"] == 2
    assert e["blocks_dropped"] == 1
    assert e["units_total"] == N_EMB_HOT + 2  # zero vector excluded
    assert e["units_dropped"] == N_EMB_HOT
    assert e["docs_deferred"] == N_EMB_HOT
    assert e["docs_probe_truncated"] is None

    # sanity: a 50-member bucket (== cap) would be KEPT — the bound is
    # strict-greater, mirrored in both engines
    assert HOT_BUCKET_CAP < N_DUP <= 2 * HOT_BUCKET_CAP + 1


def test_coverage_cap_boundaries_are_strict_greater(spark, tmp_path):
    """The exact boundary semantics, in both engines: a block of
    EXACTLY the cap is KEPT (the bound is strict-greater, mirrored in
    the oracle), and a probe reach of EXACTLY JACCARD_PROBE_CAP is NOT
    truncated — nw=150 gives reach ((1500 DIV 7) DIV 2) - 75 = 32 == cap
    (kept), nw=154 gives 33 (truncated).  An off-by-one in either
    engine's inequality flips one of these counts."""
    rows = []
    for i in range(JACCARD_BLOCK_CAP):  # exactly the cap: kept
        text = " ".join(f"b{i:03d}y{j}" for j in range(10))
        rows.append((i + 1, text, "en", "crafted", len(text)))
    at_cap = " ".join(f"E{j:03d}" for j in range(150))  # reach 32 == cap
    over_cap = " ".join(f"F{j:03d}" for j in range(154))  # reach 33
    rows.append((700, at_cap, "en", "crafted", len(at_cap)))
    rows.append((701, over_cap, "en", "crafted", len(over_cap)))
    sf_dir = str(tmp_path)
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.parquet(f"{sf_dir}/documents.parquet")
    spark.createDataFrame(
        [(1, [1.0, -1.0, 1.0])], "vec_id bigint, embedding array<float>"
    ).write.parquet(f"{sf_dir}/embeddings.parquet")

    j = {
        r["tier"]: r.asDict() for r in dedup_coverage(spark, sf_dir).collect()
    }["jaccard"]
    assert j["blocks_dropped"] == 0  # the ==cap block is kept
    assert j["docs_deferred"] == 0
    assert j["docs_probe_truncated"] == 1  # only the reach-33 doc

    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet/*.parquet'"
        )
    want = {
        row[0]: row[1:] for row in con.execute(_duck_coverage_sql()).fetchall()
    }
    con.close()
    assert want["jaccard"][1] == 0  # blocks_dropped
    assert want["jaccard"][5] == 1  # docs_probe_truncated


def test_coverage_matches_duckdb_twin_on_crafted(spark, tmp_path):
    """Cross-engine: the exact rows (including the binding-cap counts
    the driver corpus never produces) hash-match the oracle."""
    sf_dir = _write_crafted(spark, tmp_path)
    got = {
        r["tier"]: tuple(
            r[c]
            for c in (
                "blocks_total", "blocks_dropped", "units_total",
                "units_dropped", "docs_deferred", "docs_probe_truncated",
            )
        )
        for r in dedup_coverage(spark, sf_dir).collect()
    }
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(  # Spark writes a directory of part files — glob it
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet/*.parquet'"
        )
    want = {
        row[0]: tuple(row[1:]) for row in con.execute(_duck_coverage_sql()).fetchall()
    }
    con.close()
    assert got == want


def test_coverage_base_param_measures_the_given_corpus(spark, tmp_path):
    """``base=`` (r14 candidate #2 — the lm_score pattern): the three
    TEXT tiers must measure exactly the caller's frame.  Pinned by
    equivalence: coverage(base=subset-of-dir-A) == coverage(dir-B that
    physically holds only that subset), text tiers row-for-row; and
    base=None stays byte-identical to the registered corpus-level
    form.  The emb_cos tier follows the embeddings TABLE by design
    (vectors key on vec_id, not doc_id) — asserted unchanged."""
    from lens_sds_batch_spark.sources.parquet import load_table

    sf_a = _write_crafted(spark, tmp_path / "a")

    def keyed(df):
        return {r["tier"]: tuple(r.asDict().items()) for r in df.collect()}

    # identity: base=the full documents frame == the registered form
    full = keyed(dedup_coverage(spark, sf_a))
    via_base = keyed(
        dedup_coverage(spark, sf_a, base=load_table(spark, sf_a, "documents"))
    )
    assert via_base == full

    # subset: keep only the 101 byte-identical dups (the banded-cap
    # corpus) — drop the jaccard-block and long-doc docs
    subset = load_table(spark, sf_a, "documents").where("doc_id >= 400")
    got = keyed(dedup_coverage(spark, sf_a, base=subset))

    # physical twin: a dir holding ONLY the subset, same embeddings
    sf_b = str(tmp_path / "b")
    subset.write.parquet(f"{sf_b}/documents.parquet")
    spark.read.parquet(f"{sf_a}/embeddings.parquet").write.parquet(
        f"{sf_b}/embeddings.parquet"
    )
    want = keyed(dedup_coverage(spark, sf_b))
    assert got == want

    # and the subset numbers moved (the claim is powered, not vacuous):
    # the jaccard block cap no longer binds, the banded caps still do
    by_tier = {dict(v)["tier"]: dict(v) for v in got.values()}
    assert by_tier["jaccard"]["blocks_dropped"] == 0
    assert by_tier["jaccard"]["units_total"] == N_DUP
    assert by_tier["minhash"]["docs_deferred"] == N_DUP
    assert by_tier["simhash"]["docs_deferred"] == N_DUP
    full_tiers = {dict(v)["tier"]: dict(v) for v in full.values()}
    assert full_tiers["jaccard"]["blocks_dropped"] > 0  # differs from base run
    # emb tier ignores base (vec_id-keyed table): identical either way
    assert by_tier["emb_cos"] == full_tiers["emb_cos"]
