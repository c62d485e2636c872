"""Curation-op differential tests: the Spark results are re-derived
independently in plain Python (hashlib md5 draws, greedy packing walk,
set-algebra contamination) — catching any drift between the Spark
expressions, the DuckDB oracles, and the documented semantics."""

from __future__ import annotations

import hashlib

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from lens_sds_batch_spark.operators.curation import (
    PACK_BUDGET,
    SAMPLE_RATES,
    _DEFAULT_RATE,
    pack_sequences,
    stratified_sample,
)
from lens_sds_batch_spark.operators.textops import (
    CONTAM_N,
    EVAL_RATE,
    eval_contamination,
)

from .conftest import SF_SMOKE


def _u_py(doc_id: int, salt: str) -> float:
    h = hashlib.md5(f"{salt}{doc_id}".encode()).hexdigest()
    return int(h[:8], 16) / float(1 << 32)


def _docs(spark):
    return {
        r["doc_id"]: (r["text"], r["lang"], r["source"])
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    }


def test_stratified_sample_matches_python_walk(spark):
    docs = _docs(spark)
    want = {
        did
        for did, (_, lang, _) in docs.items()
        if _u_py(did, "smp:") < SAMPLE_RATES.get(lang, _DEFAULT_RATE)
    }
    got = {r["doc_id"] for r in stratified_sample(spark, SF_SMOKE).collect()}
    assert got == want
    assert 0 < len(got) < len(docs)  # non-degenerate split


def test_pack_sequences_matches_python_walk(spark):
    docs = _docs(spark)
    # greedy walk: per (lang, source) shard ordered by doc_id,
    # bin = exclusive-cumsum // budget
    shards: dict[tuple, list[tuple[int, int]]] = {}
    for did in sorted(docs):
        text, lang, source = docs[did]
        shards.setdefault((lang, source), []).append((did, len(text.split(" "))))
    want: dict[tuple, tuple[int, int]] = {}
    for (lang, source), items in shards.items():
        acc = 0
        for _, n_tok in items:
            b = acc // PACK_BUDGET
            k = (lang, source, b)
            n, s = want.get(k, (0, 0))
            want[k] = (n + 1, s + n_tok)
            acc += n_tok
    got = {
        (r["lang"], r["source"], r["bin"]): (r["n_docs"], r["sum_tokens"])
        for r in pack_sequences(spark, SF_SMOKE).collect()
    }
    assert got == want


def test_pack_sequences_bins_contiguous(spark):
    rows = pack_sequences(spark, SF_SMOKE).collect()
    by_shard: dict[tuple, list[int]] = {}
    for r in rows:
        by_shard.setdefault((r["lang"], r["source"]), []).append(r["bin"])
    for bins in by_shard.values():
        assert sorted(bins) == list(range(len(bins)))  # 0..max, no gaps


def test_eval_contamination_matches_python_walk(spark):
    docs = _docs(spark)

    def grams(text: str) -> set[str]:
        toks = text.split(" ")
        return {
            " ".join(toks[i : i + CONTAM_N]) for i in range(len(toks) - CONTAM_N + 1)
        }

    eval_ids = {did for did in docs if _u_py(did, "evl:") < EVAL_RATE}
    eval_grams = set().union(*(grams(docs[d][0]) for d in eval_ids)) if eval_ids else set()
    want = {
        did: (int(did in eval_ids), 0 if did in eval_ids else len(grams(docs[did][0]) & eval_grams))
        for did in docs
    }
    got = {
        r["doc_id"]: (r["is_eval"], r["eval_ngram_hits"])
        for r in eval_contamination(spark, SF_SMOKE).collect()
    }
    assert got == want
    assert eval_ids  # split actually selected something at this SF


def _span_walk(texts: dict[int, str]) -> dict[int, tuple[int, int, str]]:
    """Plain-Python keep-first span dedup: the independent reference
    walk for span_dedup (counts + reassembly md5 per doc)."""
    from lens_sds_batch_spark.operators.textops import SPAN_W

    spans: list[tuple[int, int, str]] = []
    for doc_id in sorted(texts):
        toks = texts[doc_id].split(" ")
        n = -(-len(toks) // SPAN_W)
        for pos in range(n):
            spans.append((doc_id, pos, " ".join(toks[pos * SPAN_W : (pos + 1) * SPAN_W])))
    first: dict[str, tuple[int, int]] = {}
    for doc_id, pos, sp in spans:  # list is already in (doc_id, pos) order
        first.setdefault(sp, (doc_id, pos))
    want = {}
    for doc_id in sorted(texts):
        mine = [(p, s) for d, p, s in spans if d == doc_id]
        kept = [s for p, s in mine if first[s] == (doc_id, p)]
        want[doc_id] = (
            len(mine),
            len(kept),
            hashlib.md5(" ".join(kept).encode()).hexdigest(),
        )
    return want


def test_span_dedup_matches_python_walk(spark):
    """Span-level keep-first dedup re-derived in plain Python over the
    real corpus: counts AND the reassembly md5 (content + order)."""
    from lens_sds_batch_spark.operators.textops import span_dedup

    want = _span_walk({did: t for did, (t, _, _) in _docs(spark).items()})
    got = {
        r["doc_id"]: (r["spans_total"], r["spans_kept"], r["dedup_text_md5"])
        for r in span_dedup(spark, SF_SMOKE).collect()
    }
    assert got == want


def test_span_dedup_keep_first_semantics(spark):
    """Crafted duplicates pin the keep-first rules the corpus may not
    exercise: cross-doc dup (earlier doc wins), within-doc self-repeat
    (earlier pos wins), doc losing ALL spans (md5 of empty string)."""
    from pyspark.sql import functions as F

    from lens_sds_batch_spark.operators.textops import SPAN_W, _tokens, span_dedup

    A = " ".join(f"w{i}" for i in range(SPAN_W))
    B = " ".join(f"x{i}" for i in range(SPAN_W))
    C = " ".join(f"y{i}" for i in range(SPAN_W))
    rows = [
        (0, f"{A} {B}"),  # first owner of A and B
        (1, f"{A} {C}"),  # A dropped, C kept
        (2, f"{B} {B}"),  # doc0 owns B: both copies dropped
        (3, f"{C} tail words"),  # C dropped, short tail span kept
    ]
    base = spark.createDataFrame(rows, "doc_id long, text string").select(
        "doc_id", _tokens(F.col("text")).alias("toks")
    )
    got = {
        r["doc_id"]: (r["spans_total"], r["spans_kept"], r["dedup_text_md5"])
        for r in span_dedup(spark, SF_SMOKE, base=base).collect()
    }

    def h(s: str) -> str:
        return hashlib.md5(s.encode()).hexdigest()

    assert got == {
        0: (2, 2, h(f"{A} {B}")),
        1: (2, 1, h(C)),
        2: (2, 0, h("")),
        3: (2, 1, h("tail words")),
    }


def test_curation_funnel_stage_order(spark):
    """Funnel stages are named, indexed, and monotonically
    non-increasing; raw == |documents|."""
    from lens_sds_batch_spark.operators.curation import curation_funnel

    rows = {
        r["stage_idx"]: (r["stage"], r["n_docs"])
        for r in curation_funnel(spark, SF_SMOKE).collect()
    }
    assert [rows[i][0] for i in range(6)] == [
        "raw",
        "quality_gate",
        "lang_en",
        "exact_dedup",
        "near_dup_pruned",
        "semantic_dedup",
    ]
    counts = [rows[i][1] for i in range(6)]
    assert counts[0] == spark.read.parquet(f"{SF_SMOKE}/documents.parquet").count()
    assert all(a >= b for a, b in zip(counts, counts[1:]))


def test_funnel_runs_capped_lm_form(spark):
    """VERDICT r13 #3: the funnel — the production-shaped consumer of
    lm_score — must demonstrably run the 100 TB vocab-capped form.
    Floor 1000 is the first floor that moves the sf0.001 keep/cut set
    (every synthetic token clears lower floors): the lm_quality stage
    keeps a DIFFERENT survivor count than the default funnel, and the
    capped DuckDB twin agrees with the capped Spark funnel row-exact
    (twin built by the same _curation_funnel_sql(min_count) the gate
    uses at its default)."""
    from lens_sds_batch_spark.operators.curation import (
        _curation_funnel_sql,
        curation_funnel,
    )

    from .oracle_utils import assert_match

    floor = 1000
    capped = curation_funnel(spark, SF_SMOKE, lm_vocab_min_count=floor)
    assert_match(capped, _curation_funnel_sql(floor), SF_SMOKE)
    s6 = {r["stage_idx"]: r["n_docs"] for r in capped.collect()}[6]
    s6_default = {
        r["stage_idx"]: r["n_docs"]
        for r in curation_funnel(spark, SF_SMOKE).collect()
    }[6]
    assert s6 != s6_default, (
        "floor no longer moves the cut set — re-probe the corpus and "
        "pick a floor that does (the differential is vacuous otherwise)"
    )


def test_doc_features_pack_capped_lm_arm(spark):
    """The pack's lm arm rides the same parameter: at floor 1000 the
    lm columns change for some docs and the capped twin agrees on the
    full 27-column row set."""
    from lens_sds_batch_spark.operators.textops import (
        doc_features_pack,
        doc_features_sql,
    )

    from .oracle_utils import assert_match

    floor = 1000
    capped = doc_features_pack(spark, SF_SMOKE, lm_vocab_min_count=floor)
    assert_match(capped, doc_features_sql(floor), SF_SMOKE)
    got = {
        r["doc_id"]: r["lm_sum_micro"]
        for r in capped.select("doc_id", "lm_sum_micro").collect()
    }
    base = {
        r["doc_id"]: r["lm_sum_micro"]
        for r in doc_features_pack(spark, SF_SMOKE)
        .select("doc_id", "lm_sum_micro")
        .collect()
    }
    assert any(got[k] != base[k] for k in got), "floor changed no score"


@pytest.mark.usefixtures("spark")
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(
            st.lists(st.integers(0, 4), min_size=1, max_size=4),  # pool-span blocks
            st.integers(0, 15),  # unique tail length (the final short span)
        ),
        min_size=1,
        max_size=6,
    )
)
def test_span_dedup_property(spark, docs_spec):
    """Hypothesis differential: random corpora assembled from a 5-span
    pool (guaranteeing cross-doc AND within-doc duplicate spans the
    fixed corpus rarely produces) + per-doc unique tails (short final
    spans) — Spark must match the Python keep-first walk exactly,
    including reassembly md5s."""
    from pyspark.sql import functions as F

    from lens_sds_batch_spark.operators.textops import SPAN_W, _tokens, span_dedup

    pool = [" ".join(f"p{j}w{i}" for i in range(SPAN_W)) for j in range(5)]
    texts = {}
    for doc_id, (blocks, tail) in enumerate(docs_spec):
        words = [pool[b] for b in blocks] + [f"t{doc_id}x{i}" for i in range(tail)]
        texts[doc_id] = " ".join(words)
    base = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    ).select("doc_id", _tokens(F.col("text")).alias("toks"))
    got = {
        r["doc_id"]: (r["spans_total"], r["spans_kept"], r["dedup_text_md5"])
        for r in span_dedup(spark, SF_SMOKE, base=base).collect()
    }
    assert got == _span_walk(texts)


def test_layout_zorder_matches_python_walk(spark):
    """Morton key re-derived in Python over the real corpus, plus
    pinned interleave values (bit i of d_len at key bit 2i, bit i of
    d_src at 2i+1)."""
    from lens_sds_batch_spark.operators.curation import ZBITS, ZBUCKET_SHIFT, layout_zorder

    def morton(a: int, b: int) -> int:
        z = 0
        for i in range(ZBITS):
            z += ((a >> i) & 1) << (2 * i) | ((b >> i) & 1) << (2 * i + 1)
        return z

    assert morton(0, 0) == 0
    assert morton(255, 255) == 65535
    assert morton(1, 0) == 1
    assert morton(0, 1) == 2
    assert morton(0b1010, 0b0101) == 0b01100110

    docs = _docs(spark)
    want = {}
    for did, (text, _, source) in docs.items():
        n_chars = len(text)
        d_len = min(n_chars // 4, 255)
        d_src = int(hashlib.md5(source.encode()).hexdigest()[:2], 16)
        z = morton(d_len, d_src)
        want[did] = (d_len, d_src, z, z >> ZBUCKET_SHIFT)
    got = {
        r["doc_id"]: (r["d_len"], r["d_src"], r["zkey"], r["zbucket"])
        for r in layout_zorder(spark, SF_SMOKE).collect()
    }
    assert got == want


def _substring_dup_walk(texts: dict[int, str]) -> dict[int, tuple[int, int, int]]:
    """Plain-Python reference for substring_dup_features: global
    shingle counts, per-doc covered-word sets, maximal-run merge."""
    from collections import Counter

    from lens_sds_batch_spark.operators.textops import SUBSTR_W

    counts: Counter = Counter()
    occ: dict[int, list[tuple[int, str]]] = {}
    for d, t in texts.items():
        toks = t.split(" ")
        occ[d] = []
        for p in range(max(len(toks) - SUBSTR_W + 1, 0)):
            s = " ".join(toks[p : p + SUBSTR_W])
            counts[s] += 1
            occ[d].append((p, s))
    want = {}
    for d in texts:
        cov: set[int] = set()
        for p, s in occ[d]:
            if counts[s] > 1:
                cov.update(range(p, p + SUBSTR_W))
        runs: list[list[int]] = []
        for w in sorted(cov):
            if runs and w == runs[-1][1] + 1:
                runs[-1][1] = w
            else:
                runs.append([w, w])
        longest = max((b - a + 1 for a, b in runs), default=0)
        want[d] = (len(cov), len(runs), longest)
    return want


def test_substring_dup_matches_python_walk(spark):
    from lens_sds_batch_spark.operators.textops import substring_dup_features

    want = _substring_dup_walk({did: t for did, (t, _, _) in _docs(spark).items()})
    got = {
        r["doc_id"]: (r["dup_word_count"], r["dup_ranges"], r["longest_dup_run"])
        for r in substring_dup_features(spark, SF_SMOKE).collect()
    }
    assert got == want
    assert any(v[0] > 0 for v in want.values())  # the corpus exercises the arm


def test_substring_dup_alignment_semantics(spark):
    """Crafted shapes: the SAME 8-word sequence detected at DIFFERENT
    alignments across docs (span_dedup's fixed grid can't see this),
    adjacent within-doc repeats merging into one maximal run, and a
    unique doc staying at zeros."""
    from pyspark.sql import functions as F

    from lens_sds_batch_spark.operators.textops import (
        SUBSTR_W,
        _tokens,
        substring_dup_features,
    )

    S = " ".join(f"s{i}" for i in range(SUBSTR_W))
    rows = [
        (0, f"{S} f0 f1 f2 f3"),          # S at word 0
        (1, f"p0 p1 p2 {S}"),             # S at word 3 (unaligned)
        (2, f"{S} {S}"),                   # adjacent repeats -> one 16-word run
        (3, " ".join(f"u{i}" for i in range(12))),  # all unique
    ]
    base = spark.createDataFrame(rows, "doc_id long, text string").select(
        "doc_id", _tokens(F.col("text")).alias("toks")
    )
    got = {
        r["doc_id"]: (r["dup_word_count"], r["dup_ranges"], r["longest_dup_run"])
        for r in substring_dup_features(spark, "unused", base=base).collect()
    }
    assert got == _substring_dup_walk({i: t for i, t in rows})
    assert got[0] == (8, 1, 8)
    assert got[1] == (8, 1, 8)
    assert got[2] == (16, 1, 16)
    assert got[3] == (0, 0, 0)
