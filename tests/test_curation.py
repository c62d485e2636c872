"""Curation-op differential tests: the Spark results are re-derived
independently in plain Python (hashlib md5 draws, greedy packing walk,
set-algebra contamination) — catching any drift between the Spark
expressions, the DuckDB oracles, and the documented semantics."""

from __future__ import annotations

import hashlib

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
