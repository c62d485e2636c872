"""LWW merge / upsert application (SURVEY.md §7.3 milestone 4).

The reference delegates actual store mutation to the downstream
transaction processor; for our engine to be queryable the command
stream must be *applicable*.  The portable pattern (no Delta needed):
union current+incoming → row_number over the key ordered by recency →
keep rank 1 → drop tombstones.  With Delta/Iceberg on the cluster this
becomes ``MERGE INTO``; the semantics below are identical.

At 100 TB: one shuffle on the merge key (same layout the downstream
queries want), map-side combinable, AQE-skew-safe.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def apply_lww(
    df: DataFrame,
    keys: list[str],
    order_cols: list[Column],
    is_delete: Column,
) -> DataFrame:
    """Keep the latest row per key (ordering = order_cols DESC chain),
    dropping keys whose latest row is a tombstone.

    A NULL ``is_delete`` on the winning row drops the key too:
    ``where(~NULL)`` filters NULL exactly like SQL's ``WHERE NOT
    is_remove`` — the DuckDB oracles rely on that agreement, so do NOT
    "fix" this to coalesce NULL→False without changing both sides.
    Callers with nullable tombstone sources should coalesce BEFORE
    calling if keep-on-NULL is the semantics they want."""
    w = Window.partitionBy(*keys).orderBy(*[c.desc() for c in order_cols])
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") == 1)
        .where(~is_delete)
        .drop("__rk")
    )


def merge_into(
    spark,
    target_path: str,
    updates: DataFrame,
    keys: list[str],
    order_cols: list[str],
    is_delete: Column,
) -> dict:
    """Apply an update batch to a stored table: ``MERGE INTO`` when the
    target is a Delta table and delta-spark is importable, else the
    portable parquet path (read target → union → apply_lww → write-swap).
    Both paths implement the SAME contract: latest row per key wins by
    the ``order_cols`` DESC chain; a key disappears when its winner is
    an UPDATE row satisfying ``is_delete``.

    - TOMBSTONE CONTRACT (r8 continuation review): ``is_delete`` is
      evaluated on UPDATE rows ONLY, with NULL normalized to False —
      MERGE semantics, where only a newer matching source row can
      delete a stored key.  Stored target rows are never re-evaluated
      as tombstones (Delta's ``whenMatched*`` clauses physically
      cannot delete a target row without a matching newer source row,
      so a fallback that re-applied ``is_delete`` to target winners
      would destroy data the Delta path preserves; and a NULL
      ``__del`` would make BOTH matched clauses no-fire on Delta while
      the fallback's ``where(~NULL)`` dropped the key).  This differs
      deliberately from bare :func:`apply_lww`, whose single-frame
      contract keeps its documented NULL-drops semantics.

    - ``order_cols`` are COLUMN NAMES here (not expressions): the Delta
      branch needs them on both merge sides to build the
      lexicographic "source is newer" condition.
    - TIE-BREAK CONTRACT (total since r8): exact ties on the FULL
      ``order_cols`` chain keep the TARGET row in BOTH branches.  The
      Delta condition is strict "source newer than target" (tie ⇒ no
      match fires ⇒ target kept); the parquet fallback appends a
      target-priority column to the ordering so the union's
      ``row_number`` agrees instead of picking an arbitrary winner.
      Ties WITHIN the update batch resolve by ``xxhash64`` over the
      full row in both branches (the Delta branch's source collapse
      and the fallback's window share the tiebreak), so the two
      engines agree row-for-row without the caller supplying a
      sequence column.  NULL order values rank as the OLDEST in both
      branches (the fallback's DESC sort is NULLS LAST; the Delta
      condition is built null-safe with `<=>` ties and an explicit
      non-NULL-beats-NULL term — a naive `>` would strand NULL-ordered
      target rows forever on the Delta path only).  (A 64-bit hash
      collision between two DISTINCT tied rows would re-open
      arbitrariness; at that probability the caller's own sequence
      column is the remedy.)
    - The Delta branch first collapses ``updates`` to one winner per
      key (MERGE requires unique source keys), then routes
      delete/update/insert with the newer-than condition — a file-level
      rewrite of only the touched files, the fast path at 100 TB.  The
      sandbox has no delta-spark, so this branch is exercised only as
      the dispatch seam; the fallback is the tested path
      (tests/test_reference_scenarios.py::test_merge_into_fallback_equals_apply_lww).
    - The parquet fallback writes the merged state to ``<target>.__tmp``
      and swaps directories through the Hadoop FileSystem API (works on
      HDFS/S3A the same as local) — never ``mode("overwrite")`` onto
      the path being read, which deletes input files mid-scan.

    Returns ``{"engine": "parquet-swap", "rows": <merged count>}`` (the
    count rides the write via ``Observation`` — free) or ``{"engine":
    "delta", "rows": None, "metrics": <operationMetrics>}`` — the Delta
    path deliberately does NOT count the merged table (a full scan per
    micro-batch at 100 TB); the commit's operationMetrics carry the
    touched-row counts instead.
    """
    order_exprs = [F.col(c) for c in order_cols]
    # deterministic within-batch tiebreak, shared by both branches (see
    # TIE-BREAK CONTRACT above): hash of the full payload row
    row_hash = F.xxhash64(*[F.col(c) for c in updates.columns])
    try:
        from delta.tables import DeltaTable  # type: ignore

        have_delta = DeltaTable.isDeltaTable(spark, target_path)
    except Exception:  # delta-spark absent or path not a Delta table
        have_delta = False

    if have_delta:
        from delta.tables import DeltaTable  # type: ignore

        src = apply_lww(
            updates, keys, order_exprs + [row_hash], is_delete=F.lit(False)
        ).withColumn("__del", F.coalesce(is_delete.cast("boolean"), F.lit(False)))
        key_cond = " AND ".join(f"t.`{k}` = s.`{k}`" for k in keys)
        # Lexicographic "source strictly newer than target" over
        # order_cols, NULL-SAFE with NULL = oldest (r8 review): a plain
        # `s.c > t.c` is NULL when either side is NULL, so the clause
        # would never fire and a NULL-ordered target could never be
        # superseded — while the fallback's DESC sort (NULLS LAST =
        # NULL sorts oldest) would supersede it.  Null-safe equality
        # (`<=>`) on the tie chain plus an explicit
        # "non-NULL beats NULL" strict term keeps the two branches on
        # the SAME total order: NULL is the minimum order value
        # everywhere.
        newer_terms = []
        for i, c in enumerate(order_cols):
            ties = " AND ".join(f"s.`{o}` <=> t.`{o}`" for o in order_cols[:i])
            term = (
                f"(s.`{c}` > t.`{c}` OR (s.`{c}` IS NOT NULL AND t.`{c}` IS NULL))"
            )
            newer_terms.append(f"({ties} AND {term})" if ties else f"({term})")
        newer = " OR ".join(newer_terms)
        tgt = DeltaTable.forPath(spark, target_path)
        (
            tgt.alias("t")
            .merge(src.alias("s"), key_cond)
            .whenMatchedDelete(condition=f"s.__del AND ({newer})")
            .whenMatchedUpdate(
                condition=f"NOT s.__del AND ({newer})",
                set={c: f"s.`{c}`" for c in updates.columns},
            )
            .whenNotMatchedInsert(
                condition="NOT s.__del", values={c: f"s.`{c}`" for c in updates.columns}
            )
            .execute()
        )
        # NO full-table count here (r8 continuation review): re-scanning
        # the whole Delta table per micro-batch would dwarf the
        # file-level merge it follows at 100 TB.  The merge's own
        # operationMetrics (rows inserted/updated/deleted) come free
        # from the commit history; total table rows stay None.
        metrics: dict = {}
        try:
            hist = tgt.history(1).select("operationMetrics").collect()
            if hist:
                metrics = dict(hist[0]["operationMetrics"] or {})
        except Exception:  # history API unavailable: metrics stay empty
            pass
        return {"engine": "delta", "rows": None, "metrics": metrics}

    from pyspark.sql import Observation
    from pyspark.sql.utils import AnalysisException

    jvm_path = spark._jvm.org.apache.hadoop.fs.Path
    tmp = target_path.rstrip("/") + ".__tmp"
    old = target_path.rstrip("/") + ".__old"
    fs = jvm_path(target_path).getFileSystem(spark._jsc.hadoopConfiguration())
    # CRASH RECOVERY FIRST (r6 review): a prior run that died between
    # the two renames left the only copy of the table at __old and no
    # target — restore it BEFORE the read, or this run would take the
    # "first batch" path and the cleanup below would delete the sole
    # surviving state.
    if not fs.exists(jvm_path(target_path)) and fs.exists(jvm_path(old)):
        if not fs.rename(jvm_path(old), jvm_path(target_path)):
            raise IOError(f"merge_into: crash recovery rename {old} -> {target_path} failed")
    # ONLY the read sits in the try: a schema mismatch in unionByName
    # must raise loudly — swallowing it as "no target yet" would
    # replace the whole table with just the malformed batch.
    try:
        current = spark.read.parquet(target_path)
    except AnalysisException:  # first batch: no target yet
        current = None
    # Total ordering (r8): target rows outrank source rows on exact
    # order-chain ties (Delta's strict-newer semantics), then the shared
    # row hash resolves within-batch ties deterministically.
    # TOMBSTONE CONTRACT (see docstring): __del is computed on the
    # UPDATE rows only, NULL-normalized; target rows carry False so a
    # stored key can only disappear when a newer update row deletes it —
    # exactly what Delta's whenMatchedDelete can and cannot do.
    upd_tagged = updates.withColumn("__tgt_pri", F.lit(0)).withColumn(
        "__del", F.coalesce(is_delete.cast("boolean"), F.lit(False))
    )
    if current is None:
        unioned = upd_tagged
    else:
        unioned = (
            current.withColumn("__tgt_pri", F.lit(1))
            .withColumn("__del", F.lit(False))
            .unionByName(upd_tagged)
        )
    merged = apply_lww(
        unioned, keys, order_exprs + [F.col("__tgt_pri"), row_hash], F.col("__del")
    ).drop("__tgt_pri", "__del")
    obs = Observation()
    merged = merged.observe(obs, F.count(F.lit(1)).alias("n"))
    merged.write.mode("overwrite").parquet(tmp)
    # Swap via rename-aside, not delete-then-rename: with the recovery
    # branch above, every crash point leaves a readable state — the old
    # table (crash before the second rename; restored on next run) or
    # the new one; only the cleanup of __old can be lost, and a
    # leftover __old while the target EXISTS is provably stale.
    fs.delete(jvm_path(old), True)  # stale leftover (target exists here)
    # Move aside whenever the PATH exists — not just when it was
    # readable parquet (r6 review): a pre-created empty dir or junk
    # leftovers read as "no target" (current=None), but renaming tmp
    # onto an existing directory NESTS it on HDFS (silent data loss)
    # or fails on local FS.  Aside-moving the junk too keeps the
    # destination clear without destroying anything.
    if fs.exists(jvm_path(target_path)) and not fs.rename(
        jvm_path(target_path), jvm_path(old)
    ):
        raise IOError(f"merge_into: could not move {target_path} aside")
    if not fs.rename(jvm_path(tmp), jvm_path(target_path)):
        # Put back WHATEVER was moved aside — not only readable parquet
        # (r7 review): when the pre-existing target was junk/empty
        # (current is None) it still went to __old above, and skipping
        # the restore would leave NO path at target for the rest of
        # this process (next-call crash recovery only fires when __old
        # exists AND target doesn't — which it would — but in-process
        # readers meanwhile see a missing table).  Restoring uncondi-
        # tionally leaves the path exactly in its pre-merge state.
        if fs.exists(jvm_path(old)):
            fs.rename(jvm_path(old), jvm_path(target_path))
        raise IOError(f"merge_into: could not swap {tmp} -> {target_path}")
    fs.delete(jvm_path(old), True)
    return {"engine": "parquet-swap", "rows": obs.get["n"]}
