"""Similarity search over the ``embeddings`` table (north-star B11).

- brute-force cosine top-k: the exactness baseline.  All arithmetic is
  forced to DOUBLE *before* any multiply and accumulated in array order
  so Spark and DuckDB produce bit-identical cosines; norms are computed
  once per vector (not per pair).
- LSH-bucketed top-k: the scale path — sign-quantization over the first
  SIGN_BITS dimensions buckets the corpus; queries probe only their own
  bucket.  At 100 TB the bucket column is a partition key: candidate
  generation is an equi-join, never a cross join.

Dot products use built-in higher-order array functions
(``zip_with`` + ``aggregate``) — JVM-side, no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.cols import temp_col_name
from ..session import local_df
from ..sources.parquet import load_table

TOP_K = 10
SIGN_BITS = 8
QUERY_STRIDE = 100  # vec_id % STRIDE == 0 -> a query vector


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _vecs(spark, sf_dir):
    df = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    return df.withColumn("norm", F.sqrt(_dot(F.col("v"), F.col("v"))))


# Validity rides the norm (see ivf_knn's rationale): NULL array or any
# NULL element -> norm NULL; empty array -> norm 0.0; zero vector ->
# norm 0.0.  All are excluded — a zero/empty norm makes every cosine
# NaN, which desc-sorts ABOVE every real neighbor in BOTH engines, so
# one degenerate row would occupy rank 1 of every query's top-k
# (r11 review; previously only ivf_knn filtered, and without the
# norm > 0 term).
def _valid_norm():  # lazy: building a Column needs an active session,
    # and this module must import session-free (test collection,
    # registry aggregation)
    return F.col("norm").isNotNull() & (F.col("norm") > 0)


def valid_vec(vcol) -> "F.Column":
    """Validity predicate from a raw vector column (for frames without
    the precomputed norm — e.g. the streaming assign path)."""
    sq = _dot(vcol, vcol)
    return sq.isNotNull() & (sq > 0)


def _valid_vecs(spark, sf_dir):
    """_vecs filtered to VALID vectors: non-NULL finite-positive norm,
    no NULL elements, and length equal to the corpus's MODAL dimension.
    The dim pin is the ragged-row exclusion (structural corruption, the
    FAISS index policy): a short/long vector would otherwise crash
    Spark's ANSI array indexing in the sign bucketing, NULL-poison
    Spark dots while DuckDB's NULL-skipping list_sum computes a finite
    partial dot, and rank at engine-divergent positions.  The modal dim
    is derived engine-side (1-row broadcast join, no driver action)
    with ties broken to the smaller dim in both engines."""
    vecs = _vecs(spark, sf_dir).where(_valid_norm())
    mode = (
        vecs.groupBy(F.size("v").alias("d"))
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), F.asc("d"))
        .limit(1)
        .select("d")
    )
    return vecs.join(F.broadcast(mode), F.size("v") == F.col("d")).drop("d")


# DuckDB twin: NULL emb / empty -> norm NULL there (list_sum over zero
# elements is NULL, unlike Spark's 0.0 seed — both land excluded); an
# element-level NULL needs the explicit filter term because DuckDB's
# list_sum SKIPS null entries (a finite partial dot) where Spark's
# aggregate null-poisons — without it the engines would rank a
# ragged/elem-null vector at opposite ends (r11 review).
_DUCK_VALID = (
    "norm IS NOT NULL AND norm > 0 "
    "AND len(list_filter(emb, x -> x IS NULL)) = 0"
)


def _topk(scored: DataFrame) -> DataFrame:
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), "vec_id")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= TOP_K)
        .select("qid", "vec_id", "cos", "rk")
    )


def knn_bruteforce(spark: SparkSession, sf_dir: str, base: DataFrame | None = None) -> DataFrame:
    """Exact cosine top-k: every STRIDE-th vector queries the corpus.
    Degenerate embeddings (NULL / empty / zero-norm / NULL-element) are
    excluded on BOTH sides — see _valid_norm.  ``base``: optional
    pre-validated (vec_id, v, norm) frame — knn_pack shares ONE
    checkpointed validity pass across its arms (each arm's plan would
    otherwise re-run the modal-dim aggregate; same device as
    doc_features_pack's shared tokenized scan)."""
    vecs = _valid_vecs(spark, sf_dir) if base is None else base
    queries = vecs.where(F.col("vec_id") % QUERY_STRIDE == 0).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv"), F.col("norm").alias("qnorm")
    )
    pairs = vecs.crossJoin(F.broadcast(queries)).where(F.col("vec_id") != F.col("qid"))
    scored = pairs.select(
        "qid",
        "vec_id",
        (_dot(F.col("qv"), F.col("v")) / (F.col("qnorm") * F.col("norm"))).alias("cos"),
    )
    return _topk(scored)


_DUCK_DOT = (
    "list_sum(list_transform(range(1, len({a})+1), i -> "
    "CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
)

_DUCK_V = (
    "SELECT vb.* FROM "
    "(SELECT * FROM (SELECT vec_id, embedding AS emb, "
    f"sqrt({_DUCK_DOT.format(a='embedding', b='embedding')}) AS norm FROM embeddings) "
    f"WHERE {_DUCK_VALID}) vb "
    "JOIN (SELECT len(emb) AS d FROM "
    "(SELECT * FROM (SELECT vec_id, embedding AS emb, "
    f"sqrt({_DUCK_DOT.format(a='embedding', b='embedding')}) AS norm FROM embeddings) "
    f"WHERE {_DUCK_VALID}) "
    "GROUP BY 1 ORDER BY count(*) DESC, d LIMIT 1) md ON len(vb.emb) = md.d"
)


KNN_BRUTEFORCE_SQL = f"""
WITH v AS MATERIALIZED ({_DUCK_V}),
q AS (SELECT vec_id AS qid, emb AS qv, norm AS qnorm FROM v WHERE vec_id % {QUERY_STRIDE} = 0),
scored AS (
  SELECT qid, vec_id, ({_DUCK_DOT.format(a='qv', b='emb')}) / (qnorm * norm) AS cos
  FROM v CROSS JOIN q WHERE vec_id <> qid
),
ranked AS (
  SELECT qid, vec_id, cos,
         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rk
  FROM scored
)
SELECT qid, vec_id, cos, rk FROM ranked WHERE rk <= {TOP_K} ORDER BY qid, rk
"""


def _bucket(vcol):
    # F.get, not getItem: ANSI getItem throws on out-of-range (callers
    # pre-filter to the modal dim, but the bucket expr must not be the
    # thing that crashes if that invariant ever slips)
    bits = [F.when(F.get(vcol, i) >= 0, F.lit("1")).otherwise(F.lit("0")) for i in range(SIGN_BITS)]
    return F.concat(*bits)


def knn_lsh_bucketed(spark: SparkSession, sf_dir: str, base: DataFrame | None = None) -> DataFrame:
    """Approximate top-k: probe only the query's sign-quantization
    bucket (axis-aligned hyperplane LSH).  Degenerate embeddings are
    excluded BEFORE bucketing (they all land in bucket '00000000' and
    would both pollute candidates and burn the bucket cap).  ``base``:
    see knn_bruteforce."""
    vecs = (_valid_vecs(spark, sf_dir) if base is None else base).withColumn(
        "bucket", _bucket(F.col("v"))
    )
    queries = vecs.where(F.col("vec_id") % QUERY_STRIDE == 0).select(
        F.col("vec_id").alias("qid"),
        F.col("v").alias("qv"),
        F.col("norm").alias("qnorm"),
        F.col("bucket").alias("qbucket"),
    )
    pairs = vecs.join(
        F.broadcast(queries), (F.col("bucket") == F.col("qbucket")) & (F.col("vec_id") != F.col("qid"))
    )
    scored = pairs.select(
        "qid",
        "vec_id",
        (_dot(F.col("qv"), F.col("v")) / (F.col("qnorm") * F.col("norm"))).alias("cos"),
    )
    return _topk(scored)


def _duck_bucket(col: str) -> str:
    bits = " || ".join(
        f"CASE WHEN {col}[{i + 1}] >= 0 THEN '1' ELSE '0' END" for i in range(SIGN_BITS)
    )
    return f"({bits})"


KNN_LSH_SQL = f"""
WITH v AS MATERIALIZED (SELECT *, {_duck_bucket('emb')} AS bucket FROM ({_DUCK_V})),
q AS (SELECT vec_id AS qid, emb AS qv, norm AS qnorm, bucket AS qbucket FROM v
      WHERE vec_id % {QUERY_STRIDE} = 0),
scored AS (
  SELECT qid, vec_id, ({_DUCK_DOT.format(a='qv', b='emb')}) / (qnorm * norm) AS cos
  FROM v JOIN q ON v.bucket = q.qbucket AND v.vec_id <> q.qid
),
ranked AS (
  SELECT qid, vec_id, cos,
         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rk
  FROM scored
)
SELECT qid, vec_id, cos, rk FROM ranked WHERE rk <= {TOP_K} ORDER BY qid, rk
"""


def knn_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B11 ANN pack (r6): exact brute-force cosine top-k + the
    LSH-bucketed approximate variant in one CORRECTNESS row,
    union-harmonized onto (kind, qid, vec_id, cos, rk).  Each arm is
    the unchanged original operator (individually unit-tested in
    test_similarity_quality); folding frees a slot in the driver's
    50-query window (see COVERAGE.md pack map).  No trailing orderBy —
    a global sort would run both arms twice for range-boundary
    sampling; the driver compare is order-insensitive."""
    from ..session import local_ckpt

    shared = local_ckpt(_valid_vecs(spark, sf_dir), eager=False)
    brute = knn_bruteforce(spark, sf_dir, base=shared).select(
        F.lit("brute").alias("kind"), "qid", "vec_id", "cos", "rk"
    )
    lsh = knn_lsh_bucketed(spark, sf_dir, base=shared).select(
        F.lit("lsh").alias("kind"), "qid", "vec_id", "cos", "rk"
    )
    return brute.unionByName(lsh)


KNN_PACK_SQL = f"""
SELECT 'brute' AS kind, qid, vec_id, cos, rk
FROM ({KNN_BRUTEFORCE_SQL.strip().rstrip(';')})
UNION ALL
SELECT 'lsh' AS kind, qid, vec_id, cos, rk
FROM ({KNN_LSH_SQL.strip().rstrip(';')})
ORDER BY kind, qid, rk
"""


QUERIES: dict[str, tuple] = {
    "knn_pack": (knn_pack, KNN_PACK_SQL),
}


DUP_COS_THRESHOLD = 0.9
# Corpus-calibrated near-dup tau (r6): the semantic default above
# targets true near-copies, but the SYNTHETIC embeddings are random —
# max within-bucket cosine ~0.43 at sf0.01 — so every consumer that
# gated on 0.9 was VACUOUSLY green (zero pairs; found by
# tools/degeneracy_audit.py).  Queries that need the pair machinery
# EXERCISED on this corpus (dup_pairs_pack's emb arm, the funnel's
# SemDeDup stage) use this tau ≈ the top-1% of within-bucket pair
# cosines; a real pipeline tunes exactly this dial against a held-out
# duplicate-judgment set.
SEM_COS_TAU = 0.35
EMB_BUCKET_CAP = 200  # skew guard: drop sign buckets larger than this


def embedding_dup_pairs(
    spark: SparkSession, sf_dir: str, threshold: float = DUP_COS_THRESHOLD
) -> DataFrame:
    """Embedding-cosine near-dup pairs, LSH-bucket-blocked (never a
    corpus-wide cross join): pairs within the same sign bucket with
    cosine >= threshold.

    Buckets larger than EMB_BUCKET_CAP are dropped (same skew guard as
    dedup's HOT_BUCKET_CAP, mirrored in the oracle).  Real corpora have
    exactly this hot-bucket shape — zero vectors, default embeddings,
    mass-duplicated rows all land in one sign bucket, and the
    within-bucket self-join is quadratic in its size (measured: 70x
    cost at 100x rows when every bucket holds ~100 exact copies).

    Degenerate embeddings are excluded BEFORE bucketing (r11 review):
    they could never produce a pair themselves (NULL/NaN cosine fails
    the threshold), but they all hash to sign bucket '00000000' and
    previously counted toward EMB_BUCKET_CAP — enough NULL rows
    silently evicted every VALID all-negative-prefix vector's pairs,
    in both engines, so the gate could not see it."""
    vecs = _valid_vecs(spark, sf_dir).withColumn("bucket", _bucket(F.col("v")))
    bucket_sizes = vecs.groupBy("bucket").agg(F.count(F.lit(1)).alias("bn"))
    vecs = vecs.join(bucket_sizes.where(F.col("bn") <= EMB_BUCKET_CAP), "bucket").drop("bn")
    a = vecs.select(F.col("vec_id").alias("ia"), F.col("v").alias("va"), F.col("norm").alias("na"), "bucket")
    b = vecs.select(F.col("vec_id").alias("ib"), F.col("v").alias("vb"), F.col("norm").alias("nb"), F.col("bucket").alias("bucket_b"))
    pairs = a.join(b, (F.col("bucket") == F.col("bucket_b")) & (F.col("ia") < F.col("ib")))
    scored = pairs.select(
        F.col("ia").alias("vec_a"),
        F.col("ib").alias("vec_b"),
        (_dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))).alias("cos"),
    )
    return scored.where(F.col("cos") >= threshold)


def embedding_dup_sql(threshold: float = DUP_COS_THRESHOLD) -> str:
    """DuckDB twin of embedding_dup_pairs at the given threshold."""
    return f"""
WITH v_all AS MATERIALIZED (SELECT *, {_duck_bucket('emb')} AS bucket FROM ({_DUCK_V})),
kept AS (SELECT bucket FROM v_all GROUP BY bucket HAVING count(*) <= {EMB_BUCKET_CAP}),
v AS MATERIALIZED (SELECT v_all.* FROM v_all JOIN kept USING (bucket))
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       ({_DUCK_DOT.format(a='a.emb', b='b.emb')}) / (a.norm * b.norm) AS cos
FROM v a JOIN v b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE ({_DUCK_DOT.format(a='a.emb', b='b.emb')}) / (a.norm * b.norm) >= {threshold}
ORDER BY vec_a, vec_b
"""


# embedding_dup_pairs rides in dedup.dup_pairs_pack (registry stays
# inside the driver's 50-query CORRECTNESS window); the function +
# embedding_dup_sql(threshold) stay for tests and the pack arms.  (The
# old module-level EMBEDDING_DUP_SQL constant baked in the vacuous 0.9
# default and had no consumer — removed, r11 review.)


IVF_K = 16
IVF_NPROBE = 2
# Expected KMeans fit-set size (Bernoulli draw at CAP/n — a BINOMIAL
# size ~CAP±sqrt(CAP), NOT a hard bound; a hard cap would need a
# sort+limit that costs more than the fit it trims).  1024 < the sf0.1
# corpus (2000 vectors), so the sampled path actually executes in the
# bench and scale runs rather than being dead code (r6 review finding:
# at 2048 it never ran anywhere).
IVF_FIT_CAP = 1024


def assign_cells(df: DataFrame, centers: list[list[float]], vec_col: str = "v") -> DataFrame:
    """KMeans cell assignment as a STATELESS Catalyst projection:
    ``argmin_k ||v - c_k||²  ==  argmax_k (v·c_k - ||c_k||²/2)`` (the
    ``||v||²`` term is constant per row and drops out).  Ties break to
    the LOWEST cell index — same as the ML model's first-min rule —
    via lexicographic ``array_max`` over ``struct(score, -k)``.

    Mathematically the same argmin as ``model.transform``, but the
    fp evaluation order differs from Spark ML's fastSquaredDistance,
    so vectors lying exactly on a cell boundary can round to a
    different (equally-near) cell; self-consistent within
    :func:`ivf_knn`.  A NULL vector or one whose length mismatches
    the centers' dimension raises at execution (``zip_with`` pads
    with NULL → every score NULL) instead of silently landing in
    cell 0 — mirroring the exception ``model.transform`` throws.

    Because it is a pure per-row projection (no model object, no
    state), the SAME function assigns on batch AND streaming frames —
    the streaming IVF story (VERDICT r6 #8) is this function applied
    to a ``readStream`` DataFrame, no foreachBatch required.  The fit
    stays batch (KMeans over a bounded sample, see :func:`ivf_knn`);
    at 100 TB the centers are a K×dim driver literal (IVF_K=16), far
    below broadcast thresholds."""
    scored = []
    for k, c in enumerate(centers):
        half_sq = sum(x * x for x in c) / 2.0
        dot = _dot(F.col(vec_col), F.array([F.lit(float(x)) for x in c]))
        scored.append(
            F.struct((dot - F.lit(half_sq)).alias("score"), F.lit(-k).alias("negk"))
        )
    best = F.array_max(F.array(*scored))
    dim = len(centers[0]) if centers else 0
    # TWO projections, not one (r9 A/B finding): referencing `best`
    # from inside a CaseWhen branch defeats codegen subexpression
    # elimination (conditional branches are excluded from CSE, the
    # same class as the HOF-lambda gotcha in NOTES.md), so the r8
    # one-projection guard evaluated the whole K-centroid scoring
    # TWICE per row — measured 1.5-2x on a 200k-row frame and the
    # dominant share of ivf_knn's r7→r8 1.29x exec drift.  A separate
    # withColumn keeps one evaluation: CollapseProject refuses to
    # inline a non-cheap alias referenced more than once.
    tmp = temp_col_name(df, "__assign_best")
    b = F.col(tmp)
    guarded = F.when(b["score"].isNotNull(), (-b["negk"]).cast("int")).otherwise(
        F.raise_error(
            F.lit(
                f"assign_cells: NULL vector or dimension != {dim} "
                "(scores all NULL) — would silently assign cell 0"
            )
        ).cast("int")
    )
    return (
        df.withColumn(tmp, best)
        .withColumn("cell", guarded)
        .drop(tmp)
    )


def ivf_knn(spark: SparkSession, sf_dir: str, base: DataFrame | None = None) -> DataFrame:
    """IVF (inverted-file) ANN: seeded KMeans partitions the corpus
    into IVF_K cells; each query probes its IVF_NPROBE nearest
    centroids and ranks only those cells — the trained-index scale
    path next to the hash-based LSH variant.  Rows-only check:
    KMeans cell assignment isn't reproducible in the SQL oracle
    (recall is checked in tests against knn_bruteforce instead)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    # Invalid embeddings (NULL array, NULL element, empty) are EXCLUDED
    # from fit, assignment, and candidate sets — the FAISS behavior: an
    # index is built over valid vectors, a corrupt row doesn't kill the
    # build.  RAGGED dimensions still raise (in the ML fit / the
    # assign_cells guard): inconsistent dims are structural corruption,
    # not a row-level data gap.  No-op on a clean corpus.
    # Validity RIDES THE NORM (r9): `_vecs` already computes
    # norm = sqrt(aggregate(v·v)), and that aggregate propagates NULL
    # for a NULL array or any NULL element — so norm.isNotNull() is
    # the same predicate the r8 `~F.exists(v, isNull)` computed with a
    # SECOND array traversal per row per scan (vecs feeds the fit, the
    # assignment, and the candidate join).  Empty arrays aggregate to
    # 0.0 (non-NULL), hence the size check.
    vecs = _valid_vecs(spark, sf_dir) if base is None else base
    ml = vecs.withColumn("features", array_to_vector("v"))
    # maxIter=8 (r6): the default 20 costs 3.9s of builder wall-clock at
    # sf0.1 for a 0.25% training-cost difference (1851.9 vs 1847.3 —
    # measured); an ANN coarse quantizer needs balanced cells, not a
    # converged optimum, and recall is guarded twice (pytest bound +
    # the oracle-pinned recall floor).
    # Sampled fit (late r6) — the 100 TB scale path: the coarse
    # quantizer trains on a deterministic hash-drawn subset of
    # expected size IVF_FIT_CAP (the full corpus is still ASSIGNED to
    # cells; only the fit set shrinks).  Real IVF builds (FAISS
    # train_size) do the same — centroids from a sample are
    # statistically equivalent for cell balancing.  The draw is the
    # same audited uniform-hash primitive the curation ops use.
    from .curation import _u

    ml_fit = ml
    n = ml.count()
    if n > IVF_FIT_CAP:
        ml_fit = ml.where(_u(F.col("vec_id"), "ivf:") < F.lit(IVF_FIT_CAP / n))
    model = KMeans(
        k=IVF_K, seed=42, maxIter=8, featuresCol="features", predictionCol="cell"
    ).fit(ml_fit)
    centers = [[float(x) for x in c] for c in model.clusterCenters()]
    # Assignment through the shared stateless projection (r7): same
    # argmin-Euclidean rule as model.transform (pinned by
    # test_assign_cells_matches_kmeans_transform) but with no
    # vector-UDT conversion in the full-corpus path, and literally the
    # same code the streaming twin runs.
    assigned = assign_cells(vecs, centers).select("vec_id", "v", "norm", "cell")

    # local_df (r14-opt): the list-path createDataFrame materialized
    # this 16-row broadcast as a 32-task Python-worker stage on every
    # execution; the Arrow local form is a LocalTableScan.
    centroids = local_df(
        spark,
        [(i, c) for i, c in enumerate(centers)],
        "cell int, cv array<double>",
    )
    queries = assigned.where(F.col("vec_id") % QUERY_STRIDE == 0).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv"), F.col("norm").alias("qnorm")
    )
    # nprobe nearest centroids per query (centroids are tiny: broadcast)
    qc = queries.crossJoin(F.broadcast(centroids)).select(
        "qid", "qv", "qnorm", "cell", _dot(F.col("qv"), F.col("cv")).alias("cdot")
    )
    wq = Window.partitionBy("qid").orderBy(F.desc("cdot"), "cell")
    probed = qc.withColumn("crk", F.row_number().over(wq)).where(F.col("crk") <= IVF_NPROBE)
    cand = assigned.join(
        probed.select("qid", "qv", "qnorm", "cell"), "cell"
    ).where(F.col("vec_id") != F.col("qid"))
    scored = cand.select(
        "qid", "vec_id", (_dot(F.col("qv"), F.col("v")) / (F.col("qnorm") * F.col("norm"))).alias("cos")
    )
    return _topk(scored)


IVF_RECALL_MIN = 0.2  # the pytest bound (test_similarity_quality) made a driver claim


def ivf_knn_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-PAIRED wrapper for the IVF index (r5; was rows-only):
    KMeans cell assignment can't be reproduced in SQL, but the CLAIM
    the index makes — aggregate recall@{TOP_K} vs the exact brute-force
    baseline over the deterministic query set — can be stated as values
    DuckDB can pin: the query count (checks the query-set derivation)
    and a recall-above-floor flag (literal 1 in the oracle, so a recall
    collapse fails the CORRECTNESS row, not just pytest).  ``ivf_knn``
    itself stays the library API returning the actual neighbors."""
    from ..session import local_ckpt

    shared = local_ckpt(_valid_vecs(spark, sf_dir), eager=False)
    exact = knn_bruteforce(spark, sf_dir, base=shared).select(
        F.col("qid"), F.col("vec_id").alias("ev")
    )
    approx = ivf_knn(spark, sf_dir, base=shared).select(
        F.col("qid").alias("aqid"), F.col("vec_id").alias("av")
    )
    # ONE pass: left join marks each exact neighbor as hit/miss, then a
    # single global aggregate computes query count, exact count, and
    # hits together — the exact plan is consumed once (a semi-join +
    # separate aggregate branch would re-run the brute-force top-k
    # window per branch).
    joined = exact.join(
        approx, (exact.qid == approx.aqid) & (exact.ev == approx.av), "left"
    )
    return joined.groupBy().agg(
        F.count_distinct("qid").cast("bigint").alias("n_queries"),
        (
            F.sum(F.col("av").isNotNull().cast("int")) / F.count(F.lit(1))
            >= IVF_RECALL_MIN
        )
        .cast("int")
        .alias("recall_above_floor"),
    )


IVF_RECALL_SQL = f"""
SELECT CAST(count(*) AS BIGINT) AS n_queries, 1 AS recall_above_floor
FROM embeddings WHERE vec_id % {QUERY_STRIDE} = 0
"""

QUERIES.update({"ivf_knn": (ivf_knn_recall, IVF_RECALL_SQL)})


def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization per vector (scale = max|v|/127,
    q_i = floor(v_i/scale + 0.5)) — 4x storage cut for 100 TB vector
    stores.  Engine-identical arithmetic: floor-based round-half-up and
    double division only.  Emits the scale, a checksum of the quantized
    codes, and the worst dequantization error."""
    vecs = _vecs(spark, sf_dir)
    scale = F.aggregate(
        F.col("v"), F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x))
    ) / F.lit(127.0)
    df = vecs.withColumn("scale", scale)
    # Degenerate-scale guard (r11 review): an all-zero or empty vector
    # has scale 0, and x/0 is NaN — Spark would fabricate floor(NaN)=0
    # codes while DuckDB ERRORS casting NaN to BIGINT (and list_reduce
    # over an empty list errors outright), turning one degenerate row
    # into an engine-divergent CORRECTNESS crash.  Both engines now
    # emit q=0 codes and error 0 for scale<=0; a NULL scale (NULL
    # array / NULL element) keeps NULL outputs in both.
    degenerate = F.col("scale") <= 0
    q = F.when(
        degenerate, F.transform(F.col("v"), lambda x: F.lit(0).cast("bigint"))
    ).otherwise(
        F.transform(F.col("v"), lambda x: F.floor(x / F.col("scale") + F.lit(0.5)).cast("bigint"))
    )
    df = df.withColumn("q", q)
    dequant_err = F.aggregate(
        F.zip_with(
            F.col("v"), F.col("q"), lambda x, qi: F.abs(x - qi.cast("double") * F.col("scale"))
        ),
        F.lit(0.0),
        lambda acc, e: F.greatest(acc, e),
    )
    return df.select(
        "vec_id",
        F.round("scale", 8).alias("scale_r"),
        F.aggregate(F.col("q"), F.lit(0).cast("bigint"), lambda acc, x: acc + x).alias("qsum"),
        # F.get, not element_at: under Spark 4's ANSI default,
        # element_at THROWS on an out-of-range index, so a short/empty
        # vector would kill the query; get returns NULL like DuckDB's
        # q[i] (r11 review follow-on)
        F.get("q", 0).alias("q0"),
        F.get("q", 1).alias("q1"),
        F.when(degenerate, F.lit(0.0))
        .otherwise(F.round(dequant_err / F.col("scale"), 4))
        .alias("max_err_in_scale_units"),
    )


QUANTIZE_SQL = """
WITH v AS MATERIALIZED (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vd FROM embeddings
),
scaled AS (
  SELECT vec_id, vd,
         CASE WHEN len(vd) = 0 THEN 0.0
              ELSE list_reduce(list_transform(vd, x -> abs(x)),
                               (a, b) -> greatest(a, b)) / 127.0 END AS scale
  FROM v
),
quant AS (
  SELECT vec_id, vd, scale,
         CASE WHEN scale <= 0 THEN list_transform(vd, x -> CAST(0 AS BIGINT))
              ELSE list_transform(vd, x -> CAST(floor(x / scale + 0.5) AS BIGINT)) END AS q
  FROM scaled
)
SELECT vec_id,
       round(scale, 8) AS scale_r,
       -- empty list: Spark's aggregate seed gives 0 where list_sum
       -- gives NULL; a NULL q (NULL input vector) stays NULL in both;
       -- a NULL ELEMENT poisons the checksum to NULL (Spark's acc+NULL
       -- semantics — honest "unknown" for a partially corrupt vector)
       -- where bare list_sum would silently skip it
       CASE WHEN q IS NULL THEN NULL
            WHEN len(list_filter(q, x -> x IS NULL)) > 0 THEN NULL
            ELSE CAST(coalesce(list_sum(q), 0) AS BIGINT) END AS qsum,
       q[1] AS q0,
       q[2] AS q1,
       CASE WHEN scale <= 0 THEN 0.0
            ELSE round(list_reduce(list_transform(range(1, len(vd) + 1),
                                                  i -> abs(vd[i] - q[i] * scale)),
                                   (a, b) -> greatest(a, b)) / scale, 4) END
         AS max_err_in_scale_units
FROM quant
ORDER BY vec_id
"""

QUERIES.update({"embedding_quantize_int8": (embedding_quantize_int8, QUANTIZE_SQL)})


# Predicate-power probes (see registry.all_probes / dedup.PROBES header)
PROBES: dict[str, tuple] = {
    "knn arms both populated, ranks beyond 1": (
        "knn_pack", "oracle",
        "SELECT (SELECT count(DISTINCT kind) - 1 FROM t),"
        " (SELECT max(rk) - 1 FROM t)"),
    "ivf recall floor holds over real queries": (
        "ivf_knn", "oracle",
        "SELECT n_queries, recall_above_floor FROM t"),
    "int8 quantization sees both signs": (
        "embedding_quantize_int8", "oracle",
        "SELECT sum(CASE WHEN q0 < 0 OR q1 < 0 THEN 1 ELSE 0 END),"
        " sum(CASE WHEN q0 > 0 OR q1 > 0 THEN 1 ELSE 0 END) FROM t"),
    "int8 quantization error nonzero but half-ulp bounded": (
        "embedding_quantize_int8", "oracle",
        "SELECT sum(CASE WHEN max_err_in_scale_units > 0 THEN 1 ELSE 0 END),"
        " sum(CASE WHEN max_err_in_scale_units <= 0.5 THEN 1 ELSE 0 END) FROM t"),
}
