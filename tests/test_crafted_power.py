"""Crafted-input tests restoring verification power where the
synthetic corpus is DEGENERATE (found by tools/degeneracy_audit.py):

- the corpus has zero exact-duplicate texts, so dedup_exact /
  dedup_fingerprint run gate-green with n_copies == 1 everywhere — a
  wrong keeper or count would never show;
- every doc scores highest on English stopwords, so lang_id never
  predicts es/de/fr at the gate;
- every (lang, source) shard fits one PACK_BUDGET bin, so the packing
  cumsum's bin arithmetic never exceeds bin 0.

Each test synthesizes the missing shape and checks the operator's
full contract against hand-computed expectations."""

from __future__ import annotations

from pyspark.sql import functions as F


def _write_docs(spark, tmp_path, rows):
    """rows: (doc_id, text, lang, source) -> a documents.parquet dir
    usable as an sf_dir."""
    d = str(tmp_path)
    spark.createDataFrame(
        [(i, t, lang, src, len(t)) for i, t, lang, src in rows],
        "doc_id long, text string, lang string, source string, n_chars int",
    ).coalesce(1).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    return d


def test_dedup_exact_with_real_duplicates(spark, tmp_path):
    from lens_sds_batch_spark.operators.dedup import dedup_exact

    rows = [
        (0, "alpha beta", "en", "s0"),
        (3, "alpha beta", "en", "s0"),   # dup of 0 -> keeper 0, copies 2
        (7, "alpha beta", "en", "s1"),   # third copy
        (1, "gamma", "en", "s0"),        # unique
        (5, "Alpha beta", "en", "s0"),   # case differs -> NOT an exact dup
    ]
    sf = _write_docs(spark, tmp_path, rows)
    got = {r["keeper_id"]: r["n_copies"] for r in dedup_exact(spark, sf).collect()}
    assert got == {0: 3, 1: 1, 5: 1}


def test_dedup_fingerprint_normalizes_variants(spark, tmp_path):
    from lens_sds_batch_spark.operators.dedup import dedup_fingerprint

    rows = [
        (0, "alpha beta", "en", "s0"),
        (2, "Alpha,  BETA!", "en", "s0"),  # case/punct/space variant -> same fp
        (4, "alpha  beta", "en", "s0"),    # double space -> same fp
        (6, "alpha gamma", "en", "s0"),    # different content
    ]
    sf = _write_docs(spark, tmp_path, rows)
    got = {r["keeper_id"]: r["n_copies"] for r in dedup_fingerprint(spark, sf).collect()}
    assert got == {0: 3, 6: 1}


def test_lang_id_discriminates_all_languages(spark):
    from lens_sds_batch_spark.operators.textops import LANG_STOPWORDS, _tokens, lang_id

    rows = [
        (i, " ".join(LANG_STOPWORDS[lang] * 3) + " filler", lang)
        for i, lang in enumerate(LANG_STOPWORDS)
    ]
    base = spark.createDataFrame(rows, "doc_id long, text string, lang string").select(
        "doc_id", "text", "lang", _tokens(F.col("text")).alias("toks")
    )
    got = {
        r["doc_id"]: (r["predicted_lang"], r["label_match"])
        for r in lang_id(spark, "unused", base=base).collect()
    }
    want = {i: (lang, 1) for i, lang in enumerate(LANG_STOPWORDS)}
    assert got == want


def test_pack_sequences_fills_multiple_bins(spark, tmp_path):
    from lens_sds_batch_spark.operators.curation import PACK_BUDGET, pack_sequences

    # one shard of 10 docs x 300 tokens: budget 1024 -> bins of 3 docs
    # (cumsum-exclusive // 1024: 0,300,600 -> 0; 900,1200,1500 -> 0,1,1 ...)
    text = " ".join(f"w{i}" for i in range(300))
    rows = [(i, text, "en", "s0") for i in range(10)]
    sf = _write_docs(spark, tmp_path, rows)
    got = {
        r["bin"]: (r["n_docs"], r["sum_tokens"])
        for r in pack_sequences(spark, sf).collect()
    }
    # python walk: exclusive cumsum // budget
    want: dict[int, list[int]] = {}
    acc = 0
    for _ in rows:
        b = acc // PACK_BUDGET
        n, s = want.get(b, (0, 0))
        want[b] = (n + 1, s + 300)
        acc += 300
    assert got == want
    assert len(got) >= 3  # the multi-bin path is actually exercised


def test_q2_min_cost_ties_emit_all_winners(spark, tmp_path):
    """The synthetic corpus has ZERO per-part min-cost ties at any SF
    (degeneracy check, r10), so the gate never proves q2 keeps ALL
    suppliers achieving the regional minimum — and never proves the
    region filter beats a cheaper out-of-region supplier.  Craft both
    shapes: two EUROPE suppliers tied at the min must BOTH emit; an
    ASIA supplier with a strictly lower cost must NOT win; filtered
    parts (size, type) must not appear."""
    from lens_sds_batch_spark.operators.relational import q2_min_cost_supplier

    d = str(tmp_path)

    def w(name, rows, schema):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{d}/{name}.parquet")

    w("region", [(0, "EUROPE"), (1, "ASIA")], "r_regionkey int, r_name string")
    w(
        "nation",
        [(0, "NATION_EU", 0), (1, "NATION_AS", 1)],
        "n_nationkey int, n_name string, n_regionkey int",
    )
    w(
        "supplier",
        [(1, "S1", 0, 100.0), (2, "S2", 0, 50.0), (3, "S3", 1, 999.0)],
        "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
    )
    w(
        "part",
        [
            (10, "crafted gadget", "Brand#1", "STANDARD", 5, 900.0),
            (11, "too big", "Brand#1", "STANDARD", 50, 900.0),
            (12, "wrong type", "Brand#1", "PROMO", 5, 900.0),
        ],
        "p_partkey long, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double",
    )
    w(
        "lineitem",
        [
            (10, 1, 7.00),  # S1 also sold higher -- min() must pick 5.00
            (10, 1, 5.00),
            (10, 2, 5.00),  # S2 TIES S1 at the regional min
            (10, 3, 1.00),  # ASIA supplier strictly cheaper -- region-excluded
            (11, 1, 2.00),  # size-filtered part
            (12, 1, 2.00),  # type-filtered part
        ],
        "l_partkey long, l_suppkey long, l_extendedprice double",
    )
    got = sorted(
        (r["p_partkey"], r["s_name"], r["n_name"], r["cost_cents"], r["s_acctbal"])
        for r in q2_min_cost_supplier(spark, d).collect()
    )
    assert got == [
        (10, "S1", "NATION_EU", 500, 100.0),
        (10, "S2", "NATION_EU", 500, 50.0),
    ]


def test_q13_zero_bucket_preserved(spark, tmp_path):
    """The corpus has NO customer with c_count == 0 at any gate SF
    (predicate-power probe, r10: every customer owns at least one
    non-'4-NOT SPECIFIED' order), so the hash gate never proves the
    LEFT OUTER's defining behavior — the zero bucket.  Craft both ways
    a customer can land there: no orders at all (outer preserve), and
    ONLY excluded-priority orders (the exclusion must act as an
    ON-clause/pre-join filter; a post-join WHERE would destroy both
    rows via NULL comparison)."""
    from lens_sds_batch_spark.operators.relational import q13_customer_distribution

    d = str(tmp_path)

    def w(name, rows, schema):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{d}/{name}.parquet")

    w("customer", [(1,), (2,), (3,), (4,)], "c_custkey long")
    w(
        "orders",
        [
            (1, "1-URGENT"),
            (1, "5-LOW"),
            (2, "4-NOT SPECIFIED"),  # only excluded orders -> zero bucket
            # customer 3: no orders at all -> zero bucket
            (4, "3-MEDIUM"),
        ],
        "o_custkey long, o_orderpriority string",
    )
    got = {
        r["c_count"]: r["custdist"]
        for r in q13_customer_distribution(spark, d).collect()
    }
    assert got == {0: 2, 1: 1, 2: 1}


def test_q15_revenue_ties_emit_all_suppliers(spark, tmp_path):
    """The corpus has exactly ONE supplier at the max window revenue at
    the gate SF (predicate-power probe, r10), so the gate never proves
    q15's tie semantics: every supplier whose exact-DECIMAL revenue
    equals the max must emit.  Craft a tie reached through DIFFERENT
    line splits and discounts (so the equality is on the aggregated
    decimal, not on identical inputs), a near-miss 1 cent below, and
    an out-of-window line big enough to win if the window leaked."""
    import datetime

    from lens_sds_batch_spark.operators.relational import q15_top_supplier

    d = str(tmp_path)
    ts = lambda s: datetime.datetime.fromisoformat(s)

    def w(name, rows, schema):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{d}/{name}.parquet")

    w(
        "lineitem",
        [
            (1, 100.00, 0.00, ts("1998-02-01")),            # S1: 100.00
            (2, 60.00, 0.00, ts("1998-01-15")),             # S2: 60
            (2, 50.00, 0.20, ts("1998-03-31")),             # S2: +40 -> ties at 100.00
            (3, 99.99, 0.00, ts("1998-02-10")),             # S3: 1 cent short
            (4, 1000.00, 0.00, ts("1998-04-01")),           # window-excluded
        ],
        "l_suppkey long, l_extendedprice double, l_discount double, "
        "l_shipdate timestamp",
    )
    w(
        "supplier",
        [(1, "S1"), (2, "S2"), (3, "S3"), (4, "S4")],
        "s_suppkey long, s_name string",
    )
    got = sorted(
        (r["s_name"], r["total_rev"]) for r in q15_top_supplier(spark, d).collect()
    )
    assert got == [("S1", 100.0), ("S2", 100.0)]


def test_full_outer_extends_both_sides(spark, tmp_path):
    """At the sf0.01 gate every nation has BOTH customers and
    suppliers, and suppliers-without-customers never occurs at ANY SF
    (predicate-power probe, r10) — so the hash gate never proves the
    full outer's defining behavior despite the arm docstring's claim.
    Craft all three shapes: customer-only nation (right-NULL → n_supp
    0), supplier-only nation (left-NULL → n_cust 0), and a matched
    nation carrying real counts on both sides."""
    from lens_sds_batch_spark.operators.relational import join_full_outer

    d = str(tmp_path)

    def w(name, rows, schema):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{d}/{name}.parquet")

    w("customer", [(10,), (10,), (10,), (20,)], "c_nationkey int")
    w("supplier", [(10,), (30,), (30,)], "s_nationkey int")
    got = sorted(
        (r["nationkey"], r["n_cust"], r["n_supp"])
        for r in join_full_outer(spark, d).collect()
    )
    assert got == [(10, 3, 1), (20, 1, 0), (30, 0, 2)]


def test_curation_funnel_every_stage_cuts(spark, tmp_path):
    """On the real corpus the funnel's lang_en and exact_dedup stages
    remove NOTHING (power probe, r10: 449 -> 449 -> 449), so the hash
    gate never proves their wiring inside the composition — a funnel
    that skipped the lang join or deduped on the wrong column would
    still match.  Craft one casualty per stage and assert the exact
    survivor counts: low-quality doc (stage 1), Spanish doc that
    PASSES the quality gate (its en-stopword ratio is 0, under the 0.2
    ceiling; stage 2), exact duplicate (stage 3), same-word-set
    near-dup — identical minhash signatures, different md5 (stage 4),
    and a same-sign-bucket embedding pair above SEM_COS_TAU
    (stage 5); r12 adds the lm_quality stage — the w-docs share a
    10-word vocabulary that dominates the crafted corpus (each w-token
    ≥ 12/314 of all tokens → avg ln-prob ≈ -3.06 > LM_MIN_LOGPROB),
    while every other survivor's tokens appear ≤ 2 times globally
    (ln(2/314) ≈ -5.06 < the threshold), so stage 6 cuts docs 1/5/7
    and keeps exactly doc 9."""
    from lens_sds_batch_spark.operators.curation import curation_funnel

    d = str(tmp_path)

    def words(prefix, n):
        return " ".join(f"{prefix}{i}" for i in range(n))

    doc1 = words("a", 24)
    doc5 = words("b", 24)
    # 24 tokens over a 10-word vocab (TTR 0.42 passes the gate); six
    # permutations = distinct md5s but ONE minhash word set
    w_multiset = [f"w{i}" for i in range(10)] * 2 + ["w0", "w1", "w2", "w3"]

    def w_doc(rot):
        return " ".join(w_multiset[rot:] + w_multiset[:rot])

    rows = [
        (1, doc1, "en", "s0"),                       # cut at stage 6 (rare tokens)
        (2, "too short", "en", "s0"),                # stage 1: < 20 tokens
        (3, "el " + words("s", 20) + " la de y", "es", "s0"),  # stage 2: es
        (4, doc1, "en", "s1"),                       # stage 3: exact dup of 1
        (5, doc5, "en", "s0"),                       # survives to stage 6 (smaller id)
        (6, " ".join(reversed(doc5.split())), "en", "s0"),  # stage 4: same
        # word set as 5 -> identical minhash signature, different md5
        (7, words("c", 24), "en", "s0"),             # survives to stage 6 (smaller id)
        (8, words("d", 24), "en", "s0"),             # stage 5: embedding dup of 7
        (9, w_doc(0), "en", "s0"),                   # survives EVERYTHING (common tokens)
        (10, w_doc(1), "en", "s0"),                  # stage 4: near-dups of 9
        (11, w_doc(2), "en", "s0"),
        (12, w_doc(3), "en", "s0"),
        (13, w_doc(5), "en", "s0"),
        (14, w_doc(7), "en", "s0"),
    ]
    spark.createDataFrame(
        [(i, t, lang, src, len(t)) for i, t, lang, src in rows],
        "doc_id long, text string, lang string, source string, n_chars int",
    ).coalesce(1).write.mode("overwrite").parquet(f"{d}/documents.parquet")

    embs = [
        (1, [-1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0], 0),  # own bucket
        (5, [-1.0, -1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0], 0),  # own bucket
        (7, [1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0], 0),
        (8, [1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 0.9], 0),   # cos(7,8) ~ 1
    ]
    spark.createDataFrame(
        embs, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(f"{d}/embeddings.parquet")

    got = {
        r["stage_idx"]: (r["stage"], r["n_docs"])
        for r in curation_funnel(spark, d).collect()
    }
    assert got == {
        0: ("raw", 14),
        1: ("quality_gate", 13),
        2: ("lang_en", 12),
        3: ("exact_dedup", 11),
        4: ("near_dup_pruned", 5),   # cut 6 (dup of 5) + 10..14 (dups of 9)
        5: ("semantic_dedup", 4),    # cut 8 (embedding dup of 7)
        6: ("lm_quality", 1),        # cut 1/5/7 (rare tokens); 9 survives
    }


def test_unicode_text_oracle_parity(spark, tmp_path):
    """The synthetic corpus is pure ASCII (power probe, r10: zero docs
    match [^\\x00-\\x7F] at any SF), so the hash gate never proves the
    two engines agree on MULTI-BYTE text — md5 fingerprints hash UTF-8
    bytes on both sides, length()/len() both count codepoints, split
    tokenization and the rolling hashes see the same units.  Drive the
    four documents-only packs through the REAL gate comparator
    (drive_driver.compare_one: schema + type families + value
    multiset) over accented Latin, CJK, astral-plane emoji, and
    sharp-s/umlaut text."""
    import duckdb

    from tools.drive_driver import compare_one
    import __spark_entry__ as em

    d = str(tmp_path)
    texts = [
        "the café résumé naïve façade " * 5,
        "日本語 テスト 文字列 " * 8,
        "emoji \U0001F600 \U0001F680 mixed ascii words here " * 4,
        "combining á é marks ö ü words " * 5,
        "plain ascii control group with many distinct words " * 4,
        "zürich über straße größe maß " * 6,
    ]
    rows = [
        (i, t.strip(), "en", f"s{i % 2}", len(t.strip()))
        for i, t in enumerate(texts)
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars int"
    ).coalesce(1).write.mode("overwrite").parquet(f"{d}/documents.parquet")

    qs, oracles = em.queries(), em.oracle_sql()
    con = duckdb.connect()
    # spark writes a parquet DIRECTORY; glob it for duckdb
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet/*.parquet'"
    )
    for name in [
        "dedup_basic_pack",
        "text_pack",
        "doc_features_pack",
    ]:
        assert compare_one(con, spark, name, qs[name], oracles[name], sf_dir=d), name


def test_jaccard_adjacent_bucket_boundary(spark, tmp_path):
    """r11 review (modernized for the r13 word-set blocking): exact
    same-bucket-only blocking silently missed near-dup pairs straddling
    a bucket boundary — and the oracle mirrored the gap, so the hash
    gate could never catch it.  Craft a ~0.93-jaccard pair whose
    word-set sizes (28 vs 30) land in ADJACENT W=2 buckets (14 vs 15):
    it must be found, same-bucket pairs must still be found, and no
    pair may be emitted twice.  (The multi-bucket long-doc regime is
    pinned in tests/test_jaccard_recall.py.)"""
    from lens_sds_batch_spark.operators.dedup import (
        JACCARD_BUCKET_W,
        ngram_jaccard_pairs,
    )

    words = [f"word{i:02d}" for i in range(28)]
    base = " ".join(words)                      # 28 distinct words
    straddle = base + " extratok extratok2"     # 30 -> next W=2 bucket
    same_a = " ".join(words[:-1]) + " wx"       # same bucket as base
    rows = [
        (0, base, "en", "s0"),
        (1, straddle, "en", "s0"),
        (2, same_a, "en", "s0"),
        (3, "completely different content entirely unrelated words here", "en", "s0"),
    ]
    assert 28 // JACCARD_BUCKET_W != 30 // JACCARD_BUCKET_W, "craft must straddle"
    sf = _write_docs(spark, tmp_path, rows)
    got = {(r["doc_a"], r["doc_b"]) for r in ngram_jaccard_pairs(spark, sf).collect()}
    assert (0, 1) in got, "boundary-straddling near-dup pair missed"
    assert (0, 2) in got, "same-bucket near-dup pair missed"
    all_rows = ngram_jaccard_pairs(spark, sf).collect()
    assert len(all_rows) == len(got), "a pair was emitted twice"


def test_simhash_banding_complete_vs_bruteforce(spark):
    """r11 review: the old top-byte blocking violated the operator's
    stated hamming<=HAMMING_MAX contract for any pair whose differing
    bits touched the block byte.  The banded form carries a structural
    guarantee — HAMMING_MAX=3 diffs over SIMHASH_BANDS=4 disjoint bands
    leave >=1 band identical by pigeonhole — so, modulo the documented
    per-(band, value) skew cap, the output must equal a BRUTE-FORCE
    hamming join over the real gate corpus, exactly."""
    from lens_sds_batch_spark.operators.dedup import (
        HAMMING_MAX,
        SIMHASH_BANDS,
        SIMHASH_BLOCK_CAP,
        band_mask,
        simhash_dup_pairs,
        simhash_fingerprint_ints,
    )

    from .conftest import SF_SMOKE

    fps = {
        r["doc_id"]: r["sh"]
        for r in simhash_fingerprint_ints(spark, SF_SMOKE).collect()
    }
    # per-(band, value) block sizes — the cap semantics replicated
    from collections import Counter

    blocks = Counter()
    for sh in fps.values():
        for k in range(SIMHASH_BANDS):
            blocks[(k, sh & band_mask(k))] += 1

    def kept_bands(sh):
        return {
            k for k in range(SIMHASH_BANDS)
            if blocks[(k, sh & band_mask(k))] <= SIMHASH_BLOCK_CAP
        }

    ids = sorted(fps)

    def ham(x, y):  # Python ints are unbounded: mask the signed XOR to 64 bits
        return bin((x ^ y) & ((1 << 64) - 1)).count("1")

    expected = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            if ham(fps[a], fps[b]) > HAMMING_MAX:
                continue
            shared = {
                k for k in kept_bands(fps[a]) & kept_bands(fps[b])
                if (fps[a] & band_mask(k)) == (fps[b] & band_mask(k))
            }
            if shared:
                expected.add((a, b))
    got = {
        (r["doc_a"], r["doc_b"]) for r in simhash_dup_pairs(spark, SF_SMOKE).collect()
    }
    assert len(expected) > 100, "corpus must exercise the path"
    assert got == expected
    # the structural guarantee itself: every uncapped hamming<=3 pair
    # shares at least one band (pigeonhole over 4 disjoint 16-bit bands)
    for i, a in enumerate(ids[:100]):
        for b in ids[i + 1:100]:
            if ham(fps[a], fps[b]) <= HAMMING_MAX:
                assert any(
                    (fps[a] & band_mask(k)) == (fps[b] & band_mask(k))
                    for k in range(SIMHASH_BANDS)
                )


def test_degenerate_embeddings_parity_and_exclusion(spark, tmp_path):
    """r11 review: NULL / empty / all-zero / NULL-element embeddings are
    real 100 TB shapes the clean corpus lacks.  Before the shared
    validity layer they (a) NaN-ranked at the TOP of every top-k in
    both engines (zero norm -> cos NaN, desc-sorts first), (b) diverged
    between engines (Spark empty-array norm 0.0 vs DuckDB NULL; Spark
    NULL-poisoned dots vs DuckDB's NULL-skipping list_sum), (c) crashed
    the quantize oracle (DuckDB CAST(floor(NaN) AS BIGINT) errors) and
    Spark's ANSI element_at on short vectors, and (d) burned the
    emb-dup bucket cap from sign bucket '00000000'.  Drive a corpus
    containing every degenerate shape through the REAL gate comparator
    for all three similarity queries, and assert the exclusions."""
    import duckdb

    import __spark_entry__ as em
    from tools.drive_driver import compare_one

    d = str(tmp_path)
    dim = 6
    rows = []
    # 30 valid vectors (ids 0..29; id 0 is a query under QUERY_STRIDE)
    for i in range(30):
        rows.append((i, [((i * 7 + j * 3) % 11 - 5) / 5.0 + 0.01 for j in range(dim)], f"l{i%3}"))
    rows += [
        (100, None, "lx"),                     # NULL embedding (qid 100)
        (101, [], "lx"),                       # empty array
        (102, [0.0] * dim, "lx"),              # zero vector
        (103, [0.5, None, 0.25, 0.1, 0.1, 0.1], "lx"),  # NULL element
        (104, [0.5, 0.1], "lx"),               # short vector (len 2)
        (200, [0.3] * dim, "lx"),              # valid; qid under stride
    ]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label string"
    ).coalesce(1).write.mode("overwrite").parquet(f"{d}/embeddings.parquet")

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{d}/embeddings.parquet/*.parquet'"
    )
    qs, oracles = em.queries(), em.oracle_sql()
    for name in ("knn_pack", "embedding_quantize_int8"):
        assert compare_one(con, spark, name, qs[name], oracles[name], sf_dir=d), name

    # exclusions: degenerate ids never appear in any knn role
    out = qs["knn_pack"](spark, d).collect()
    assert out, "valid vectors must still produce neighbors"
    bad = {100, 101, 102, 103}
    for r in out:
        assert r["qid"] not in bad and r["vec_id"] not in bad
        assert r["cos"] is not None and r["cos"] == r["cos"]  # no NULL/NaN

    # quantize runs-and-degrades on every shape, engine-identically
    # (compare_one above proved parity; spot-check the guard values)
    qrows = {r["vec_id"]: r for r in qs["embedding_quantize_int8"](spark, d).collect()}
    assert qrows[101]["qsum"] == 0 and qrows[101]["max_err_in_scale_units"] == 0.0
    assert qrows[102]["qsum"] == 0 and qrows[102]["q0"] == 0
    assert qrows[100]["qsum"] is None  # NULL vector stays NULL, both engines
    assert qrows[104]["q1"] is not None  # short vector: no ANSI crash


def test_lm_score_hand_computed(spark, tmp_path):
    """r12: corpus-unigram LM score against a fully hand-computable
    corpus (a=3, b=1, c=1, N=5).  The expected model mirrors the
    engine's arithmetic exactly: per-token ln-prob rounded HALF_UP on
    the double's SHORTEST decimal repr (Java BigDecimal.valueOf ==
    Python repr) to BIGINT micro-nats, integer sums, one exact float
    division — so equality is ==, not approx."""
    import math
    from decimal import Decimal, ROUND_HALF_UP

    from lens_sds_batch_spark.operators.textops import LM_MICRO, lm_score

    rows = [
        (0, "a a b", "en", "s0"),   # common-heavy doc
        (1, "a c", "en", "s0"),     # rare-heavy doc
    ]
    sf = _write_docs(spark, tmp_path, rows)

    def m(c, n=5):
        return int(
            Decimal(repr(math.log(c / n) * LM_MICRO)).quantize(
                Decimal(1), rounding=ROUND_HALF_UP
            )
        )

    exp_sum = {0: 2 * m(3) + m(1), 1: m(3) + m(1)}
    got = {r["doc_id"]: r for r in lm_score(spark, sf).collect()}
    assert {k: v["lm_sum_micro"] for k, v in got.items()} == exp_sum
    assert got[0]["lm_avg_logprob"] == exp_sum[0] / (3 * float(LM_MICRO))
    assert got[1]["lm_avg_logprob"] == exp_sum[1] / (2 * float(LM_MICRO))
    # the signal the filter exists for: the common-token doc is more
    # probable under the corpus LM than the rare-token doc
    assert got[0]["lm_avg_logprob"] > got[1]["lm_avg_logprob"]


def test_lm_score_vocab_floor_oov_bucket(spark, tmp_path):
    """r13 (r12 verdict #3): the documented 100 TB vocab bound,
    implemented.  Corpus a=3, b=1, c=1 (N=5) at floor=2 pools b and c
    into ONE OOV bucket of mass 2 — every b/c occurrence scores m(2),
    'a' keeps m(3); hand-computed with the engine's exact rounding.
    Also: capped == uncapped when the floor clears the min corpus
    count, and the capped DuckDB twin (lm_capped_sql) agrees row-exact
    — both engines implement the same smoothing."""
    import math
    from decimal import Decimal, ROUND_HALF_UP

    import duckdb

    from lens_sds_batch_spark.operators.textops import (
        LM_MICRO,
        lm_capped_sql,
        lm_score,
    )

    rows = [
        (0, "a a b", "en", "s0"),
        (1, "a c", "en", "s0"),
    ]
    sf = _write_docs(spark, tmp_path, rows)

    def m(c, n=5):
        return int(
            Decimal(repr(math.log(c / n) * LM_MICRO)).quantize(
                Decimal(1), rounding=ROUND_HALF_UP
            )
        )

    # floor=2: b (count 1) and c (count 1) pool -> OOV mass 2
    exp_sum = {0: 2 * m(3) + m(2), 1: m(3) + m(2)}
    got = {
        r["doc_id"]: r
        for r in lm_score(spark, sf, vocab_min_count=2).collect()
    }
    assert {k: v["lm_sum_micro"] for k, v in got.items()} == exp_sum
    assert got[0]["lm_avg_logprob"] == exp_sum[0] / (3 * float(LM_MICRO))
    assert got[1]["lm_avg_logprob"] == exp_sum[1] / (2 * float(LM_MICRO))

    # cross-engine: the capped DuckDB twin lands the same exact integers
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet/*.parquet'"
    )
    duck = {
        r[0]: (r[1], r[2]) for r in con.execute(lm_capped_sql(2)).fetchall()
    }
    assert duck == {
        k: (v["lm_sum_micro"], v["lm_avg_logprob"]) for k, v in got.items()
    }

    # a floor every token clears is a no-op: capped == uncapped exactly
    rows2 = [(0, "a a b b", "en", "s0"), (1, "a b", "en", "s0")]
    sf2 = _write_docs(spark, tmp_path / "eq", rows2)
    unc = sorted(map(tuple, lm_score(spark, sf2).collect()))
    cap = sorted(map(tuple, lm_score(spark, sf2, vocab_min_count=2).collect()))
    assert unc == cap
