"""Training-data curation operators over ``documents`` (north-star
B11+): the two core "assemble the training mix" operations a
100 TB-scale LLM pipeline runs after dedup/quality filtering.

- stratified_sample — per-stratum (lang) sampling rates applied via a
  DETERMINISTIC hash threshold (md5 of a salted doc key), not rand():
  reruns pick the same docs, both engines agree bit-for-bit, and the
  sample composition is auditable.  At scale this is a single scan with
  the predicate pushed to the workers — zero shuffles.
- pack_sequences — greedy sequence packing: docs are token-counted,
  ordered within a (lang, source) shard, and assigned to fixed
  token-budget bins by exclusive-cumsum div budget (the standard
  "concat then split at context boundaries" packing).  The window
  partitions by shard, so packing parallelizes across shards and no
  global order is ever required — the 100 TB form packs within input
  partitions, which is semantically free since bin membership is
  arbitrary grouping.

All JVM built-ins (md5 / conv / split / window cumsum) — no Python in
the hot path; both have exact DuckDB twins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..session import local_ckpt
from ..sources.parquet import load_table

# per-language mixture rates (upsample quality-rich en, downsample the
# long tail) — illustrative fixed mix; a real run feeds these from a
# mixture-weights config
SAMPLE_RATES = {"en": 0.75, "de": 0.5, "fr": 0.5, "es": 0.25, "zh": 0.25}
_DEFAULT_RATE = 0.1
_HASH_DENOM = float(1 << 32)

PACK_BUDGET = 1024  # tokens per packed sequence bin


def _u(doc_id_col, salt: str = "smp:"):
    """Deterministic uniform-[0,1) draw per doc: first 8 hex chars of a
    salted md5, as an integer fraction of 2^32.  Exact in IEEE double
    (numerator < 2^32), so the threshold compare is reproducible and
    engine-independent."""
    h = F.md5(F.concat(F.lit(salt), doc_id_col.cast("string")).cast("binary"))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("double") / F.lit(_HASH_DENOM)


def u_sql(salt: str = "smp:", col: str = "doc_id") -> str:
    """DuckDB twin of :func:`_u` (an expression over ``col``; callers
    with a qualified column pass it instead of string-replacing the
    output — r11 review)."""
    return (
        f"CAST(CAST('0x' || substr(md5('{salt}' || CAST({col} AS VARCHAR)), 1, 8) "
        f"AS BIGINT) AS DOUBLE) / {_HASH_DENOM}"
    )


def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep each doc iff its deterministic draw is under its language's
    rate; emit the draw for audit.  Zero-shuffle scan+filter."""
    docs = load_table(spark, sf_dir, "documents")
    rate = F.lit(_DEFAULT_RATE)
    for lang, r in sorted(SAMPLE_RATES.items()):
        rate = F.when(F.col("lang") == lang, F.lit(r)).otherwise(rate)
    return (
        docs.select("doc_id", "lang", "source", _u(F.col("doc_id")).alias("u"))
        .where(F.col("u") < rate)
    )


def _rate_case_sql() -> str:
    whens = " ".join(
        f"WHEN lang = '{lang}' THEN {r}" for lang, r in sorted(SAMPLE_RATES.items())
    )
    return f"CASE {whens} ELSE {_DEFAULT_RATE} END"


STRATIFIED_SAMPLE_SQL = f"""
SELECT doc_id, lang, source, u FROM (
  SELECT doc_id, lang, source, {u_sql('smp:')} AS u
  FROM documents
)
WHERE u < {_rate_case_sql()}
ORDER BY doc_id
"""


def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget bin assignment per (lang, source) shard, then the
    per-bin roll-up (n_docs, sum_tokens).  One shuffle on the shard
    key for the window + one partial-aggregated shuffle for the
    roll-up; the cumsum never crosses shards."""
    docs = load_table(spark, sf_dir, "documents")
    n_tok = F.size(F.split(F.col("text"), " "))
    w = (
        Window.partitionBy("lang", "source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    binned = docs.select("doc_id", "lang", "source", n_tok.alias("n_tok")).withColumn(
        "bin", ((F.sum("n_tok").over(w) - F.col("n_tok")) / PACK_BUDGET).cast("bigint")
    )
    return (
        binned.groupBy("lang", "source", "bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("sum_tokens"),
        )
    )


PACK_SEQUENCES_SQL = f"""
SELECT lang, source, bin, count(*) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS sum_tokens
FROM (
  SELECT lang, source,
         CAST((sum(n_tok) OVER w - n_tok) // {PACK_BUDGET} AS BIGINT) AS bin,
         n_tok
  FROM (SELECT doc_id, lang, source, len(string_split(text, ' ')) AS n_tok FROM documents)
  WINDOW w AS (PARTITION BY lang, source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
GROUP BY lang, source, bin
ORDER BY lang, source, bin
"""


SPLIT_TRAIN = 0.90  # u < 0.90           -> train
SPLIT_VALID = 0.95  # 0.90 <= u < 0.95   -> valid; rest -> test
N_SHARDS = 64


def corpus_shuffle_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle + train/valid/test split + output
    shard assignment — the last step before a training run reads the
    corpus.

    - ``shuffle_key`` = salted md5 of the doc key: sorting by it IS the
      global shuffle, and at scale Spark executes it as a
      range-partitioned sort.  We deliberately emit the key rather than
      a global ``row_number`` — an unpartitioned window would serialize
      the whole corpus through one task, the classic single-partition
      anti-pattern.
    - ``shard`` = first-byte bucket of the key (uniform by
      construction): the 100 TB run writes ``partitionBy(split, shard)``
      so each training reader streams one shard's files in key order.
    - ``split`` by the deterministic uniform draw (same auditable
      hash-threshold device as :func:`stratified_sample`, different
      salt so the two draws are independent).

    Zero joins, zero Python; single scan + one range-sort."""
    docs = load_table(spark, sf_dir, "documents")
    key = F.md5(F.concat(F.lit("shf:"), F.col("doc_id").cast("string")).cast("binary"))
    u = _u(F.col("doc_id"), "spl:")
    return docs.select(
        "doc_id",
        key.alias("shuffle_key"),
        (F.conv(F.substring(key, 1, 2), 16, 10).cast("bigint") % N_SHARDS).alias("shard"),
        F.when(u < SPLIT_TRAIN, "train")
        .when(u < SPLIT_VALID, "valid")
        .otherwise("test")
        .alias("split"),
    )


CORPUS_SHUFFLE_SPLIT_SQL = f"""
SELECT doc_id,
       md5('shf:' || CAST(doc_id AS VARCHAR)) AS shuffle_key,
       CAST('0x' || substr(shuffle_key, 1, 2) AS BIGINT)
         % {N_SHARDS} AS shard,
       CASE WHEN u < {SPLIT_TRAIN} THEN 'train'
            WHEN u < {SPLIT_VALID} THEN 'valid'
            ELSE 'test' END AS split
FROM (SELECT doc_id, {u_sql('spl:')} AS u FROM documents)
ORDER BY shuffle_key
"""


ZBITS = 8  # bits per z-order dimension (two dims -> 16-bit Morton key)
ZBUCKET_SHIFT = 8  # coarse layout cluster = top 8 bits of the key


def _morton(d0, d1):
    """Morton (z-order) interleave of two ``ZBITS``-wide ints via plain
    shift/mask arithmetic — bit i of d0 lands at key bit 2i, bit i of
    d1 at 2i+1.  The DuckDB twin runs the identical formula."""
    z = F.lit(0).cast("bigint")
    for i in range(ZBITS):
        z = (
            z
            + F.shiftright(d0, i).bitwiseAND(F.lit(1)) * F.lit(2 ** (2 * i))
            + F.shiftright(d1, i).bitwiseAND(F.lit(1)) * F.lit(2 ** (2 * i + 1))
        )
    return z


def layout_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) layout key per document over two pruning
    dimensions — the data-layout step a 100 TB lakehouse runs before
    writing (Delta/Iceberg ``OPTIMIZE ZORDER BY``): interleaving the
    bits of (length bucket, source hash) yields ONE sort key whose
    ranges stay local in BOTH dimensions, so parquet row-group min/max
    stats prune scans filtered on either column.

    Key assignment is a pure projection — zero shuffle at any scale;
    the physical re-layout is then a single
    ``repartitionByRange(zkey).sortWithinPartitions(zkey)`` write (the
    write side is demonstrated in ``test_scale_patterns``' partitioned
    write + partition-pruning test for ``zbucket``)."""
    docs = load_table(spark, sf_dir, "documents")
    d_len = F.least(F.floor(F.col("n_chars") / 4), F.lit(255)).cast("bigint")
    d_src = F.conv(F.substring(F.md5(F.col("source").cast("binary")), 1, 2), 16, 10).cast(
        "bigint"
    )
    keyed = docs.select("doc_id", d_len.alias("d_len"), d_src.alias("d_src"))
    z = _morton(F.col("d_len"), F.col("d_src"))
    return keyed.select(
        "doc_id",
        "d_len",
        "d_src",
        z.alias("zkey"),
        F.shiftright(z, ZBUCKET_SHIFT).cast("bigint").alias("zbucket"),
    )


def _morton_sql(a: str, b: str) -> str:
    return " + ".join(
        f"(({a} >> {i}) & 1) * {2 ** (2 * i)} + (({b} >> {i}) & 1) * {2 ** (2 * i + 1)}"
        for i in range(ZBITS)
    )


LAYOUT_ZORDER_SQL = f"""
SELECT doc_id, d_len, d_src,
       CAST({_morton_sql('d_len', 'd_src')} AS BIGINT) AS zkey,
       CAST(zkey >> {ZBUCKET_SHIFT} AS BIGINT) AS zbucket
FROM (
  SELECT doc_id,
         CAST(LEAST(n_chars // 4, 255) AS BIGINT) AS d_len,
         CAST('0x' || substr(md5(source), 1, 2) AS BIGINT) AS d_src
  FROM documents
)
ORDER BY doc_id
"""


QUERIES: dict[str, tuple] = {
    "stratified_sample": (stratified_sample, STRATIFIED_SAMPLE_SQL),
    "pack_sequences": (pack_sequences, PACK_SEQUENCES_SQL),
    "corpus_shuffle_split": (corpus_shuffle_split, CORPUS_SHUFFLE_SPLIT_SQL),
    "layout_zorder": (layout_zorder, LAYOUT_ZORDER_SQL),
}


def curation_funnel(
    spark: SparkSession, sf_dir: str, lm_vocab_min_count: int = 1
) -> DataFrame:
    """End-to-end curation FUNNEL (r6): the stage-wise survivor counts a
    training-data pipeline reports after each cut — the composition
    query over the individual B11 operators, each stage's semantics
    identical to its standalone twin:

    0 raw              |documents|
    1 quality_gate     corpus_filter survivors (token band + TTR +
                       stopword-ratio)
    2 lang_en          ∩ lang_id predicted 'en'
    3 exact_dedup      one canonical (min doc_id) per md5(text)
    4 near_dup_pruned  minus docs that are the LARGER side of a
                       minhash-LSH near-dup pair whose smaller side
                       also survived (pair-based pruning: cheaper than
                       full connected components, over-keeps only when
                       a chain's smaller member was itself cut — the
                       standard first-pass at corpus scale; the full
                       CC treatment is `dedup_clusters`)
    5 semantic_dedup   SemDeDup-style pass (Abbas et al. 2023): minus
                       docs whose EMBEDDING sits above SEM_COS_TAU
                       cosine of a surviving
                       smaller-id doc in the same LSH sign bucket —
                       catches paraphrase-level duplicates the lexical
                       stages miss.  Reuses embedding_dup_pairs'
                       capped within-bucket generation (never
                       corpus-quadratic); pair-based drop-larger-id
                       pruning stands in for SemDeDup's
                       keep-farthest-from-centroid, with the SAME
                       pair-grain caveat as stage 4: a transitive
                       chain (1-2, 2-3) drops BOTH larger sides even
                       though a sequential greedy pass would revive 3
                       once 2 is gone (r11 review — the doc previously
                       claimed greedy keep-min-id).
                       The synthetic corpus couples embeddings to docs
                       1:1 (vec_id == doc_id), which the stage relies
                       on to join pairs against doc survivors.
    6 lm_quality       (r12) the perplexity-filter pass (CCNet-style):
                       minus survivors whose corpus-unigram LM score
                       (`textops.lm_score`) falls below the FIXED
                       ``LM_MIN_LOGPROB`` threshold — improbable-token
                       outliers the lexical and semantic stages never
                       see.  A fixed threshold keeps the stage a pure
                       filter (scale-exact, cross-engine exact) like
                       the stage-1 bands; production would calibrate
                       it per corpus.

    Every stage is a filter/aggregate over the previous survivor set —
    at 100 TB the funnel is one doc-grain pass + the (already-capped)
    pair generation + the lm arm's two token-grain shuffles; counts
    are map-side-combinable aggregates.

    r14 (VERDICT r13 #1, the funnel half of the no-silent-caps runtime
    telemetry): the output gains an ``n_bypassed`` column, non-NULL on
    the near_dup_pruned row — the count of stage-3 survivors the
    minhash pruner could NOT see because every band bucket they hashed
    into was over HOT_BUCKET_CAP (one surviving band keeps a doc
    visible).  Bypassed docs pass the stage unexamined; on the sf0.1
    corpus that is ~67% of the entering set — the silent number this
    column makes loud.  The full per-tier breakdown (blocks, units,
    the jaccard probe cap) is the standalone ``dedup_coverage`` query;
    stage 5's embedding-bucket caps remain measured there when an
    embedding tier entry is added (its sign-bucket generation has no
    doc-level drop today — buckets are capped per-bucket, not
    dropped).
    """
    from .dedup import _minhash_pairs_from_banded, minhash_banded_kept
    from .similarity import SEM_COS_TAU, embedding_dup_pairs
    from .textops import LM_MIN_LOGPROB, corpus_filter, lang_id, lm_score

    docs = load_table(spark, sf_dir, "documents")
    # Each survivor set feeds BOTH its own count branch and every later
    # stage; without lineage truncation the unioned count plan
    # re-executes corpus_filter in 4 branches and lang_id in 3 (the
    # same branch-duplication class dedup_clusters checkpoints
    # against).  localCheckpoint, not persist (r6 review): persist
    # entries live in the CacheManager until an explicit unpersist —
    # a leak for a builder that returns before the result is consumed —
    # while localCheckpointed RDD storage is released by the
    # ContextCleaner once the returned plan is garbage-collected.
    s1 = local_ckpt(corpus_filter(spark, sf_dir).select("doc_id"))
    en = lang_id(spark, sf_dir).where(F.col("predicted_lang") == "en").select("doc_id")
    s2 = local_ckpt(s1.join(en, "doc_id"))
    fp = docs.join(s2, "doc_id").select(
        "doc_id", F.md5(F.col("text").cast("binary")).alias("fp")
    )
    s3 = local_ckpt(fp.groupBy("fp").agg(F.min("doc_id").alias("doc_id")).select("doc_id"))
    # ONE checkpointed banding pass feeds both the pair generation and
    # the bypass telemetry (minhash_banded_kept re-runs the signature
    # pipeline per consumer otherwise)
    banded = local_ckpt(minhash_banded_kept(docs))
    pairs = _minhash_pairs_from_banded(banded, docs).select("doc_a", "doc_b")
    drop = pairs.join(s3.withColumnRenamed("doc_id", "doc_a"), "doc_a").select("doc_b")
    # s4 feeds three consumers (its count, the semantic drop set, s5) —
    # checkpoint so the minhash pipeline doesn't re-execute per branch
    s4 = local_ckpt(s3.join(drop, s3.doc_id == drop.doc_b, "left_anti"))
    epairs = embedding_dup_pairs(spark, sf_dir, threshold=SEM_COS_TAU).select("vec_a", "vec_b")
    drop_sem = epairs.join(s4.withColumnRenamed("doc_id", "vec_a"), "vec_a").select("vec_b")
    # s5 feeds two consumers since r12 (its count + the lm-filter join)
    s5 = local_ckpt(s4.join(drop_sem, s4.doc_id == drop_sem.vec_b, "left_anti"))
    # lm_vocab_min_count (r14, VERDICT r13 #3): the production-shaped
    # consumer of lm_score runs the 100 TB form (floor + OOV bucket,
    # O(vocab-cap) broadcast) when asked; the default keeps the gate
    # arm byte-identical.  Twin: _curation_funnel_sql(min_count),
    # differential-tested at floor > 1 in tests/test_curation.py.
    lm = lm_score(
        spark, sf_dir, vocab_min_count=lm_vocab_min_count
    ).select("doc_id", "lm_avg_logprob")
    s6 = (
        s5.join(lm, "doc_id")
        .where(F.col("lm_avg_logprob") >= F.lit(LM_MIN_LOGPROB))
        .select("doc_id")
    )

    def stage(idx, name, df):
        return df.agg(
            F.lit(idx).alias("stage_idx"),
            F.lit(name).alias("stage"),
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        )

    # bypass telemetry for stage 4: stage-3 survivors with ZERO band
    # rows in cap-kept buckets are invisible to the pruner
    bypass4 = s3.join(
        banded.select("doc_id").distinct(), "doc_id", "left_anti"
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_bypassed"))

    def with_bypass(row_df, bypass=None):
        if bypass is None:
            return row_df.withColumn("n_bypassed", F.lit(None).cast("bigint"))
        return row_df.crossJoin(bypass)

    out = with_bypass(stage(0, "raw", docs))
    for i, (name, df, bp) in enumerate(
        [
            ("quality_gate", s1, None),
            ("lang_en", s2, None),
            ("exact_dedup", s3, None),
            ("near_dup_pruned", s4, bypass4),
            ("semantic_dedup", s5, None),
            ("lm_quality", s6, None),
        ],
        start=1,
    ):
        out = out.unionByName(with_bypass(stage(i, name, df), bp))
    return out


def _curation_funnel_sql(lm_vocab_min_count: int = 1) -> str:
    from .dedup import _duck_minhash_ctes
    from .similarity import SEM_COS_TAU, embedding_dup_sql
    from .textops import (
        CORPUS_FILTER_SQL,
        LANG_ID_SQL,
        LM_MIN_LOGPROB,
        lm_sql_ctes,
    )

    LM_SQL_CTES = lm_sql_ctes(lm_vocab_min_count)

    return f"""
WITH {_duck_minhash_ctes()},
q AS MATERIALIZED (SELECT doc_id FROM ({CORPUS_FILTER_SQL.strip().rstrip(';')})),
en AS (SELECT doc_id FROM ({LANG_ID_SQL.strip().rstrip(';')}) WHERE predicted_lang = 'en'),
s2 AS MATERIALIZED (SELECT doc_id FROM q JOIN en USING (doc_id)),
fp AS (SELECT d.doc_id, md5(d.text) AS f FROM documents d JOIN s2 USING (doc_id)),
s3 AS MATERIALIZED (SELECT min(doc_id) AS doc_id FROM fp GROUP BY f),
drop3 AS (SELECT p.doc_b FROM pairs p JOIN s3 a ON p.doc_a = a.doc_id),
s4 AS MATERIALIZED (SELECT doc_id FROM s3 WHERE doc_id NOT IN (SELECT doc_b FROM drop3)),
epairs AS MATERIALIZED (SELECT vec_a, vec_b FROM ({embedding_dup_sql(SEM_COS_TAU).strip().rstrip(';')})),
drop5 AS (SELECT p.vec_b FROM epairs p JOIN s4 a ON p.vec_a = a.doc_id),
s5 AS MATERIALIZED (SELECT doc_id FROM s4 WHERE doc_id NOT IN (SELECT vec_b FROM drop5)),
{LM_SQL_CTES.strip()},
s6 AS (SELECT s5.doc_id FROM s5 JOIN lm USING (doc_id)
       WHERE lm_avg_logprob >= {LM_MIN_LOGPROB})
SELECT 0 AS stage_idx, 'raw' AS stage, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(NULL AS BIGINT) AS n_bypassed FROM documents
UNION ALL SELECT 1, 'quality_gate', CAST(count(*) AS BIGINT), CAST(NULL AS BIGINT) FROM q
UNION ALL SELECT 2, 'lang_en', CAST(count(*) AS BIGINT), CAST(NULL AS BIGINT) FROM s2
UNION ALL SELECT 3, 'exact_dedup', CAST(count(*) AS BIGINT), CAST(NULL AS BIGINT) FROM s3
UNION ALL SELECT 4, 'near_dup_pruned', CAST(count(*) AS BIGINT),
       (SELECT CAST(count(*) AS BIGINT) FROM s3
         WHERE doc_id NOT IN (SELECT doc_id FROM banded)) FROM s4
UNION ALL SELECT 5, 'semantic_dedup', CAST(count(*) AS BIGINT), CAST(NULL AS BIGINT) FROM s5
UNION ALL SELECT 6, 'lm_quality', CAST(count(*) AS BIGINT), CAST(NULL AS BIGINT) FROM s6
ORDER BY stage_idx
"""


QUERIES.update({"curation_funnel": (curation_funnel, _curation_funnel_sql())})


# Predicate-power probes (see registry.all_probes / dedup.PROBES header)
PROBES: dict[str, tuple] = {
    "stratified sample cuts and keeps": (
        "stratified_sample", "oracle",
        "SELECT (SELECT count(*) FROM documents) - (SELECT count(*) FROM t),"
        " (SELECT count(*) FROM t)"),
    "packing fills multi-doc bins and overflows to new bins": (
        "pack_sequences", "oracle",
        "SELECT (SELECT count(*) FROM t WHERE n_docs > 1),"
        " (SELECT count(*) FROM (SELECT lang, source FROM t"
        "   GROUP BY 1, 2 HAVING count(DISTINCT bin) > 1))"),
    "shuffle-split emits train and holdout": (
        "corpus_shuffle_split", "oracle",
        "SELECT sum(CASE WHEN split='train' THEN 1 ELSE 0 END),"
        " sum(CASE WHEN split<>'train' THEN 1 ELSE 0 END) FROM t"),
    "shuffle-split spreads shards": (
        "corpus_shuffle_split", "oracle",
        "SELECT count(DISTINCT shard) - 1, NULL FROM t"),
    "z-order buckets spread": (
        "layout_zorder", "oracle",
        "SELECT count(DISTINCT zbucket) - 1, NULL FROM t"),
    "funnel quality_gate stage cuts": (
        "curation_funnel", "oracle",
        """SELECT (SELECT n_docs FROM t WHERE stage_idx=0)
                - (SELECT n_docs FROM t WHERE stage_idx=1), NULL"""),
    "funnel lang_en stage cuts": (
        "curation_funnel", "oracle",
        """SELECT (SELECT n_docs FROM t WHERE stage_idx=1)
                - (SELECT n_docs FROM t WHERE stage_idx=2), NULL"""),
    "funnel exact_dedup stage cuts": (
        "curation_funnel", "oracle",
        """SELECT (SELECT n_docs FROM t WHERE stage_idx=2)
                - (SELECT n_docs FROM t WHERE stage_idx=3), NULL"""),
    "funnel near_dup stage cuts": (
        "curation_funnel", "oracle",
        """SELECT (SELECT n_docs FROM t WHERE stage_idx=3)
                - (SELECT n_docs FROM t WHERE stage_idx=4), NULL"""),
    "funnel semantic stage cuts": (
        "curation_funnel", "oracle",
        """SELECT (SELECT n_docs FROM t WHERE stage_idx=4)
                - (SELECT n_docs FROM t WHERE stage_idx=5), NULL"""),
    "funnel lm stage cuts and keeps": (
        "curation_funnel", "oracle",
        """SELECT (SELECT n_docs FROM t WHERE stage_idx=5)
                - (SELECT n_docs FROM t WHERE stage_idx=6),
               (SELECT n_docs FROM t WHERE stage_idx=6)"""),
    "funnel near-dedup bypass is visible and partial": (
        "curation_funnel", "oracle",
        """SELECT (SELECT n_bypassed FROM t WHERE stage_idx=4),
               (SELECT n_docs - n_bypassed FROM t WHERE stage_idx=4)"""),
}
