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

import json

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Key-hash-bucketed target layout (r10 verdict #1): the partition
# column every bucketed target is laid out by, and the underscore-
# prefixed spec file (ignored by parquet partition discovery, like
# Delta's _delta_log) that pins the bucket count + key set so every
# later batch hashes keys into the SAME buckets.  The spec is written
# INTO THE TMP DIR before the swap, so the single directory rename
# that exposes the data exposes the spec with it — there is no crash
# window in which a bucketed layout exists without its spec (r11
# review: the earlier write-spec-after-swap ordering had one, and the
# num_buckets-trusting self-heal it required could mis-pin N and
# silently split keys across bucket spaces).
BUCKET_COL = "__bucket"
BUCKET_SPEC_FILE = "_bucket_spec.json"

# Manifest-commit layout (r11 verdict #1 — the object-store-safe flavor
# of the bucketed merge): live data is resolved through ONE small
# manifest file instead of directory renames.  Touched buckets are
# written as fresh generation directories ``__bucket=K/__gen=g<hex>/``
# (non-live until committed — a crash strands only garbage a vacuum can
# collect), then a single manifest ``_manifest/<seq>-<gen>.json`` pins
# the live generation per bucket.  The commit point is one FILE rename
# (atomic on local/HDFS; a single-object copy on S3A, where directory
# renames — which the rename flavor depends on — are non-atomic
# O(data) copy+delete).  Readers resolve paths through the latest
# manifest (read_merged_table), so the table always reads as exactly
# pre- or post-merge at every crash point.
MANIFEST_DIR = "_manifest"
GEN_COL = "__gen"

# Writer fence (r11 verdict #2): the portable flavors assume a single
# writer; the lease turns a second concurrent writer into a loud
# refusal instead of silent rename-protocol interleaving.  The lease is
# a sibling FILE (<target>.__lease) created with overwrite=False —
# atomic create-exclusive on HDFS (check-then-create on the local
# RawLocalFileSystem, good enough to catch operational mistakes; it is
# NOT a Byzantine-proof lock).  A holder that dies leaves the lease
# behind; a later writer takes over once it is older than
# ``lease_stale_sec`` — size that above the longest expected merge, or
# a slow merge can be taken over mid-flight.
LEASE_SUFFIX = ".__lease"
LEASE_STALE_SEC = 3600.0

# Marker written next to a bucket's aside when the bucket was
# intentionally EMPTIED by deletes (ADVICE r11): without it, crash
# recovery cannot distinguish "aside moved out, tmp rename pending"
# (restore) from "aside moved out, nothing replaces it by design"
# (do not restore — restoring would resurrect the deleted rows).
EMPTIED_SUFFIX = ".__emptied"


def _writer_lease(fs, jvm_path, target_path: str, stale_sec: float = LEASE_STALE_SEC):
    """Context manager acquiring the single-writer lease for a portable
    merge target (see LEASE_SUFFIX above).  Raises IOError when another
    writer holds a non-stale lease; takes over a stale one (best-effort:
    two simultaneous takeovers can still race — the loser of the
    re-create dies loudly).  Released on success AND on exception (a
    failed merge must be REPLAYED, not resumed, so holding the lease
    past the failure would only block the replay); only process death
    leaves it for age-based takeover.

    Acquisition is ATOMIC on both realistic filesystems (r12 — the
    thread-concurrency stress test caught the gap): Hadoop's
    ``create(overwrite=false)`` is atomic on HDFS but CHECK-THEN-CREATE
    on RawLocalFileSystem, so two same-host writers could briefly both
    hold the lease and wipe each other's staged tmp; ``file://``
    targets now acquire via POSIX ``O_CREAT|O_EXCL`` instead, which is
    atomic across threads AND processes."""
    import contextlib
    import os
    import socket
    import time as _time

    @contextlib.contextmanager
    def _ctx():
        lease_str = target_path.rstrip("/") + LEASE_SUFFIX
        lease = jvm_path(lease_str)
        payload = json.dumps(
            {
                "pid": os.getpid(),
                "host": socket.gethostname(),
                "acquired_unix_ms": int(_time.time() * 1000),
            }
        ).encode("utf-8")
        local = fs.getUri().getScheme() == "file"

        def _try_create():
            if local:  # POSIX O_EXCL: the only atomic exclusive-create here
                path = lease_str[len("file:"):] if lease_str.startswith(
                    "file:"
                ) else lease_str
                # First merge into a target whose PARENT does not exist
                # yet (ADVICE r12): the Hadoop fs.create this replaced
                # made parent dirs implicitly; os.open does not, and the
                # FileNotFoundError would be swallowed by the broad
                # except below and mis-reported as lease contention.
                parent = os.path.dirname(path)
                if parent:
                    os.makedirs(parent, exist_ok=True)
                fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                try:
                    os.write(fd, payload)
                finally:
                    os.close(fd)
                return
            out = fs.create(lease, False)  # overwrite=False: create-exclusive
            try:
                out.write(bytearray(payload))
            finally:
                out.close()

        try:
            _try_create()
        except Exception:
            age = None
            try:
                st = fs.getFileStatus(lease)
                age = _time.time() - st.getModificationTime() / 1000.0
            except Exception:  # holder released between create-fail and stat
                pass
            if age is not None and age <= stale_sec:
                raise IOError(
                    f"merge_into: another writer holds the lease at "
                    f"{target_path.rstrip('/') + LEASE_SUFFIX} (age {age:.0f}s "
                    f"<= stale threshold {stale_sec:.0f}s); concurrent merges "
                    "into one portable target are not supported — wait for "
                    "the holder, or use the Delta branch for concurrent "
                    "writers"
                )
            fs.delete(lease, False)  # stale (holder died) or vanished
            try:
                _try_create()
            except Exception as e:
                raise IOError(
                    f"merge_into: lease contention at "
                    f"{target_path.rstrip('/') + LEASE_SUFFIX} — a second "
                    "writer re-created the lease during stale takeover"
                ) from e
        try:
            yield
        finally:
            fs.delete(lease, False)

    return _ctx()


def _release_checkpoint(df) -> None:
    """Best-effort release of an eager localCheckpoint's storage blocks
    (ADVICE r11): ``DataFrame.unpersist()`` only uncaches
    InMemoryRelation entries, NOT the checkpointed RDD behind the plan's
    LogicalRDD, so a fast-trigger streaming sink would transiently
    accumulate blocks until the ContextCleaner GCs the frame.  Reaching
    the LogicalRDD's rdd is internal API (verified to free the blocks on
    this Spark build) — guarded, with the ContextCleaner as fallback."""
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        pass


def bucket_expr(keys: list[str], num_buckets: int) -> Column:
    """Deterministic bucket id for a key tuple: pmod(xxhash64(keys), N).

    Raw typed columns feed the hash (xxhash64 is defined for every
    atomic Spark type); the expression must never change once a target
    is laid out — the spec file exists precisely so re-derivation on a
    later batch cannot drift."""
    return F.pmod(F.xxhash64(*[F.col(k) for k in keys]), F.lit(num_buckets)).cast(
        "int"
    )


def _write_bucket_spec(
    fs, jvm_path, dir_path: str, keys: list[str], num_buckets: int,
    key_types: dict[str, str], columns: dict[str, str] | None = None,
):
    """Write the spec as ONE small file through the Hadoop FS API — a
    single filesystem op, not a Spark job (r11 review: the old 1-row
    DataFrame-write/read pair scheduled a full job per merge call,
    pure latency on the per-micro-batch streaming-sink path).

    ``key_types`` (r11 review): xxhash64 hashes the TYPED value —
    CAST(1 AS INT) and CAST(1 AS BIGINT) route to different buckets —
    so the spec pins key dtypes too, and every later batch is checked
    against them; names alone would let silent schema drift split one
    logical key across two bucket spaces.

    ``columns`` (r12 schema pin): the FULL batch schema at layout time.
    Value-column drift is as corrupting as key drift on a bucketed
    layout — a batch with an extra/missing column that lands only in
    EMPTY buckets writes a divergent per-bucket schema (unionByName
    never sees the conflict), and a later read without mergeSchema
    resolves whichever file's schema it lists first.  Every batch is
    validated against the pin; evolution = an explicit rebuild."""
    payload = json.dumps(
        {
            "num_buckets": int(num_buckets),
            "keys": list(keys),
            "key_types": dict(key_types),
            **({"columns": dict(columns)} if columns is not None else {}),
        }
    ).encode("utf-8")
    out = fs.create(jvm_path(dir_path.rstrip("/") + "/" + BUCKET_SPEC_FILE), True)
    try:
        out.write(bytearray(payload))
    finally:
        out.close()


def _read_bucket_spec(spark, fs, jvm_path, target_path: str):
    """Return ``(num_buckets, keys, key_types, columns)`` if the target
    carries a bucket spec, else None — ``columns`` is the full-schema
    pin, or None on a pre-r12 spec that never wrote one.  An
    EXISTING-but-unreadable spec raises loudly: guessing 'unbucketed'
    against a bucketed layout would route keys into the wrong bucket
    space and silently duplicate them."""
    spec_path = target_path.rstrip("/") + "/" + BUCKET_SPEC_FILE
    if not fs.exists(jvm_path(spec_path)):
        return None
    try:
        stm = fs.open(jvm_path(spec_path))
        try:
            raw = bytes(spark._jvm.org.apache.commons.io.IOUtils.toByteArray(stm))
        finally:
            stm.close()
    except Exception as e:  # IO/checksum failure on an EXISTING spec:
        # re-raise loudly (same refusal as unparseable content below)
        raise ValueError(
            f"merge_into: unreadable bucket spec at {spec_path} ({e})".split(
                "\n"
            )[0]
            + "; refusing to guess the bucket layout — repair or remove "
            "the table"
        ) from e
    try:
        spec = json.loads(raw)
        return (
            int(spec["num_buckets"]),
            list(spec["keys"]),
            dict(spec["key_types"]),
            dict(spec["columns"]) if "columns" in spec else None,
        )
    except (ValueError, KeyError, TypeError) as e:
        raise ValueError(
            f"merge_into: corrupt bucket spec at {spec_path} ({e!r}); "
            "refusing to guess the bucket layout — repair or remove the "
            "table"
        ) from e


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
    if "__rk" in df.columns:  # would be overwritten then dropped below
        raise ValueError("apply_lww: input may not carry the reserved column __rk")
    w = Window.partitionBy(*keys).orderBy(*[c.desc() for c in order_cols])
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") == 1)
        .where(~is_delete)
        .drop("__rk")
    )


def _lww_union(current, upd_tagged, keys, order_exprs, row_hash):
    """The ONE copy of the fallback merge semantics (r11 review: the
    legacy and bucketed paths had drifted-prone twins of this block):
    target rows outrank update rows on exact order-chain ties
    (``__tgt_pri``), the shared row hash breaks within-batch ties, and
    the tombstone flag is pre-computed on ``upd_tagged`` only."""
    if current is None:
        unioned = upd_tagged
    else:
        unioned = (
            current.withColumn("__tgt_pri", F.lit(1))
            .withColumn("__del", F.lit(False))
            .unionByName(upd_tagged)
        )
    return apply_lww(
        unioned, keys, order_exprs + [F.col("__tgt_pri"), row_hash], F.col("__del")
    ).drop("__tgt_pri", "__del")


def merge_into(
    spark,
    target_path: str,
    updates: DataFrame,
    keys: list[str],
    order_cols: list[str],
    is_delete: Column,
    num_buckets: int | None = None,
    protocol: str | None = None,
    lease_stale_sec: float = LEASE_STALE_SEC,
    commit_meta: dict | None = None,
    expect_seq: int | None = None,
) -> dict:
    """Apply an update batch to a stored table: ``MERGE INTO`` when the
    target is a Delta table and delta-spark is importable, else the
    portable parquet path (read target → union → apply_lww → write-swap).
    Both paths implement the SAME contract: latest row per key wins by
    the ``order_cols`` DESC chain; a key disappears when its winner is
    an UPDATE row satisfying ``is_delete``.

    - BUCKETED LAYOUT (r10 verdict #1 — the 100 TB path of the portable
      branch): pass ``num_buckets=N`` to lay the target out as
      ``__bucket=hash(keys)%N`` partition directories (the bucket count
      + key set are pinned in an underscore-hidden ``_bucket_spec``
      sidecar, auto-detected on every later call — callers need not
      re-pass N).  Each subsequent batch then collapses to its TOUCHED
      buckets, reads only those directories (partition-pruned scan),
      merges, and swaps only those directories — untouched buckets are
      never read or rewritten (the read probes exactly the touched
      bucket directories — O(touched) filesystem calls, no O(N)
      partition-discovery listing), so per-batch cost is
      O(touched-bucket bytes + batch), not O(table).  This mirrors the
      Delta branch's file-level rewrite in the code path that actually
      executes without Delta.  The first call on an EXISTING unbucketed
      target is a one-time full-cost migration (read-all → write
      bucketed); the first call on a missing target materializes
      bucketed directly.  Crash contract (weaker than Delta's
      transactional commit, stated honestly): the per-bucket
      rename-aside sequence leaves every bucket individually readable
      at every crash point — each bucket is either pre-merge or
      post-merge state (buckets EMPTIED by deletes carry a marker so
      recovery never resurrects the deleted rows, r12/ADVICE r11) —
      and the merge is idempotent (LWW over a total order); the
      recovery pass at the head of every bucketed merge restores
      asides / clears stale ones first.  A FAILED multi-bucket merge
      MUST be replayed (same batch) before any NEW batch: buckets may
      be left mixed pre/post-merge across the table, and only the
      idempotent replay converges them (streaming foreachBatch replays
      by construction; ad-hoc callers own this).  SINGLE WRITER
      enforced by a create-exclusive lease file (<target>.__lease,
      r11 verdict #2): a second concurrent merge/rebucket raises
      IOError instead of silently interleaving the rename protocol;
      a dead holder's lease is taken over after ``lease_stale_sec``.
      When concurrent writers are a requirement, that is exactly what
      the Delta branch's optimistic concurrency provides.
      Tombstone/tie-break/NULL-order contracts below apply to the
      bucketed path unchanged.

    - MANIFEST PROTOCOL (r11 verdict #1 — the object-store-safe
      flavor): pass ``protocol='manifest'`` (with ``num_buckets``) on
      first materialization to commit through generation directories +
      one manifest file instead of directory renames (see the
      MANIFEST_DIR header comment for the layout).  Auto-detected on
      every later call, same as the spec.  Strictly stronger crash
      contract than the rename flavor: the table reads as EXACTLY
      pre-merge until the single manifest-file rename lands and exactly
      post-merge after — no recovery pass, no replay-before-new-batch
      requirement, safe on S3A where directory renames are non-atomic.
      The cost is read indirection (state must be read through
      :func:`read_merged_table`) and explicit GC
      (:func:`vacuum_merged_table`).  Requires a fresh target (no
      in-place migration from an existing layout).  Re-layout to a new
      bucket count for either flavor: :func:`rebucket`.

    - COMMIT METADATA / CAS (r14, manifest flavor only): ``commit_meta``
      is a JSON dict committed ATOMICALLY inside the same manifest
      rename as the data — the transactional-offsets pattern: a
      downstream consumer that records its source cursor here can never
      observe data-without-cursor or cursor-without-data, so its replay
      after any crash is exactly-once (plans/ivm.refresh_aggregate is
      the first consumer).  The latest value is carried forward
      UNCHANGED by every later commit (merges without commit_meta,
      compaction, rebucket, evolve_schema) until the next commit_meta
      merge replaces it; read it back with :func:`read_commit_meta`.
      An explicit commit_meta with a batch that touches NO buckets
      still commits (metadata-only, live map unchanged) so the cursor
      can advance past a range that netted out to nothing.
      ``expect_seq`` is optimistic concurrency: refuse to merge unless
      the latest committed manifest seq still equals it — required by
      read-modify-write planners (the IVM delta apply), whose updates
      are only correct against the exact state they were planned from;
      the writer lease serializes commits but cannot see plan-time
      reads.  Both knobs are refused loudly on Delta / rename / plain
      targets (Delta has its own txn/appIds mechanism; the swap flavors
      keep no commit metadata).
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
      and swaps directories through the Hadoop FileSystem API — never
      ``mode("overwrite")`` onto the path being read, which deletes
      input files mid-scan.  ATOMICITY SCOPE (r11 review): the crash
      contract holds on filesystems with atomic directory rename
      (local, HDFS, ABFS).  S3A's "rename" is a non-atomic O(data)
      copy+delete — a crash mid-rename there can leave a PARTIAL
      directory that the recovery guard cannot distinguish from a
      complete one; on S3 use the Delta branch (whose log commit is
      atomic on S3) or ``protocol='manifest'`` (whose commit is one
      single-object rename — see MANIFEST PROTOCOL above), not the
      rename flavors.

    Returns ``{"engine": "parquet-swap", "rows": <merged count>}`` (the
    count rides the write via ``Observation`` — free) or ``{"engine":
    "delta", "rows": None, "metrics": <operationMetrics>}`` — the Delta
    path deliberately does NOT count the merged table (a full scan per
    micro-batch at 100 TB); the commit's operationMetrics carry the
    touched-row counts instead.
    """
    if num_buckets is not None and num_buckets < 1:
        raise ValueError(f"merge_into: num_buckets must be >= 1, got {num_buckets}")
    if protocol not in (None, "rename", "manifest"):
        raise ValueError(
            f"merge_into: protocol must be None, 'rename', or 'manifest', "
            f"got {protocol!r}"
        )
    if not order_cols:
        # an empty chain would be malformed SQL on the Delta branch and a
        # silent target-always-wins no-op on the fallback — refuse loudly
        raise ValueError("merge_into: order_cols must be non-empty")
    if commit_meta is not None:
        try:
            json.dumps(commit_meta)
        except (TypeError, ValueError) as e:
            raise ValueError(
                f"merge_into: commit_meta must be JSON-serializable "
                f"(it rides the manifest file): {e}"
            ) from e
        if not isinstance(commit_meta, dict):
            raise ValueError(
                f"merge_into: commit_meta must be a dict, got "
                f"{type(commit_meta).__name__}"
            )
    # GEN_COL joined the set in r12: on a manifest target a data column
    # named __gen would collide with the generation partition dirs at
    # read (partition-vs-data column shadowing) and the resolver's
    # drop(GEN_COL) would silently erase it from every result
    reserved = {BUCKET_COL, GEN_COL, "__del", "__tgt_pri", "__rk"} & set(
        updates.columns
    )
    if reserved:  # would be silently overwritten and dropped from output
        raise ValueError(
            f"merge_into: updates may not carry reserved columns {sorted(reserved)}"
        )
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

        # Refuse-loudly convention (ADVICE r11, cf. the kafka path guard
        # in streaming/pipeline.py): these knobs shape the PORTABLE
        # layouts only — silently ignoring them on a Delta target would
        # hand a user expecting a bucketed/manifest layout neither, with
        # no error.
        if num_buckets is not None:
            raise ValueError(
                f"merge_into: num_buckets={num_buckets} does not apply to a "
                f"Delta target ({target_path}) — Delta manages its own file "
                "layout (OPTIMIZE/ZORDER); drop the argument"
            )
        if protocol is not None:
            raise ValueError(
                f"merge_into: protocol={protocol!r} does not apply to a "
                f"Delta target ({target_path}) — the Delta log IS the commit "
                "protocol; drop the argument"
            )
        if commit_meta is not None or expect_seq is not None:
            raise ValueError(
                f"merge_into: commit_meta/expect_seq do not apply to a "
                f"Delta target ({target_path}) — use Delta's own "
                "transactional mechanisms (txnAppId/txnVersion for "
                "exactly-once, its optimistic concurrency for CAS)"
            )

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

    jvm_path = spark._jvm.org.apache.hadoop.fs.Path
    fs = jvm_path(target_path).getFileSystem(spark._jsc.hadoopConfiguration())
    # WRITER FENCE (r11 verdict #2): every portable flavor runs under
    # the create-exclusive lease — a second concurrent writer raises
    # instead of silently interleaving the swap protocol.
    with _writer_lease(fs, jvm_path, target_path, lease_stale_sec):
        return _portable_merge(
            spark, fs, jvm_path, target_path, updates, keys,
            order_exprs, row_hash, is_delete, num_buckets, protocol,
            commit_meta=commit_meta, expect_seq=expect_seq,
        )


def _check_layout_compat(
    target_path, keys, updates, spec_keys, spec_types, num_buckets, spec_n,
    spec_columns=None,
):
    """Shared key/bucket/dtype validation against a pinned layout (the
    rename flavor's _bucket_spec or a manifest's equivalent fields).
    ``spec_columns`` (r12): the full-schema pin; None on pre-pin layouts
    (validation skipped — those tables predate the pin)."""
    if list(keys) != list(spec_keys):
        raise ValueError(
            f"merge_into: target {target_path} is bucketed on keys "
            f"{list(spec_keys)}, caller passed {list(keys)}"
        )
    if num_buckets is not None and num_buckets != spec_n:
        raise ValueError(
            f"merge_into: target {target_path} has {spec_n} buckets, "
            f"caller passed num_buckets={num_buckets}"
        )
    upd_types = dict(updates.dtypes)
    drift = {
        k: (spec_types.get(k), upd_types.get(k))
        for k in keys
        if spec_types.get(k) != upd_types.get(k)
    }
    if drift:  # xxhash64 is type-sensitive: same value, other bucket
        raise ValueError(
            f"merge_into: key dtype drift vs the bucket spec at "
            f"{target_path}: {drift} (spec, batch) — the same logical "
            "key would hash into a different bucket space; cast the "
            "batch keys back to the spec types"
        )
    _check_schema_pin(target_path, spec_columns, upd_types)


def _conform_to_pin(df, pinned):
    """Project ``df`` to the pinned schema (r13, the evolve_schema read
    seam): a column in the pin but missing from the files — which is
    exactly what a METADATA-ONLY ``add`` leaves behind (the pin gains
    the column, existing parquet files do not) — reads as a typed NULL;
    non-pinned extras (the __bucket partition column) ride along
    unchanged.  Identity when the layout carries no pin (pre-r12
    tables)."""
    if pinned is None:
        return df
    have = set(df.columns)
    cols = [
        F.col(c) if c in have else F.lit(None).cast(t).alias(c)
        for c, t in pinned.items()
    ]
    extras = [F.col(c) for c in df.columns if c not in pinned]
    return df.select(*cols, *extras)


def _pinned_read(spark, paths: list, pinned, base_path: str | None = None):
    """Read live generation/bucket dirs under the layout's schema pin
    WITHOUT schema inference (r14-opt, guide §6 metadata-driven reads):
    ``mergeSchema=true`` runs a distributed footer-union job on every
    call — at 100 TB that is a pass over every touched file's footer
    per merge/read, and at the gate scale it is a fixed extra job per
    protocol phase (measured: the three footer jobs of a 2-generation
    read vanish under an explicit schema).  When the layout carries a
    pin, the pin IS the schema: live generations always match it
    exactly except for columns a METADATA-ONLY add left behind, which
    the parquet reader null-fills — byte-identical to the previous
    ``mergeSchema`` + ``_conform_to_pin`` pair (probe: same schema
    incl. the appended partition columns, same rows).  Sites that can
    legitimately see mixed-width files (the widen rewrite's own
    pre-widen read, read_changes' FROM side) keep ``mergeSchema``.
    ``pinned=None`` (pre-r12 tables) falls back to the deterministic
    ``mergeSchema`` union + identity conform, unchanged."""
    r = spark.read
    if base_path is not None:
        r = r.option("basePath", base_path)
    if pinned is None:
        return r.option("mergeSchema", "true").parquet(*paths)
    ddl = ", ".join(
        "`" + c.replace("`", "``") + "` " + t for c, t in pinned.items()
    )
    return r.schema(ddl).parquet(*paths)


def _is_empty_read(e) -> bool:
    """True iff an AnalysisException from a parquet read means "zero
    data files" (UNABLE_TO_INFER_SCHEMA on an existing-but-empty dir)
    or "no such path" (PATH_NOT_FOUND) — the only two conditions this
    storage layer treats as an empty/absent table.  Anything else
    (incompatible column types across pre-pin generations under
    mergeSchema, a tampered footer, …) must raise loudly per the
    layer's refusal conventions rather than read as an empty table
    (r13 ADVICE: the blanket catch silently reported such failures as
    'no data')."""
    for attr in ("getCondition", "getErrorClass"):
        fn = getattr(e, attr, None)
        if fn is not None:
            try:
                cond = fn()
            except Exception:
                continue
            if cond is not None:
                return cond in ("UNABLE_TO_INFER_SCHEMA", "PATH_NOT_FOUND")
    # condition-less exception (non-classified): fall back to the
    # stable message heads of the two empty cases
    msg = str(e)
    return "UNABLE_TO_INFER_SCHEMA" in msg or "PATH_NOT_FOUND" in msg


def _check_schema_pin(target_path, pinned, upd_types) -> None:
    """Refuse a batch whose value schema drifts from ``pinned`` (the
    layout's `columns` pin, or the live table schema on the plain
    flavor).  ``pinned`` None (pre-r12 spec) skips.  Every flavor needs
    this: on bucketed layouts a drifted batch landing in an EMPTY
    bucket writes a divergent per-bucket schema that reads
    non-deterministically; on the plain flavor unionByName catches
    extra/missing names but a RETYPED column silently type-coerces —
    numeric-looking strings migrate the stored column's type, anything
    else explodes mid-job as a runtime cast error (r12 probe)."""
    if pinned is None or dict(upd_types) == dict(pinned):
        return
    pinned, upd_types = dict(pinned), dict(upd_types)
    extra = sorted(set(upd_types) - set(pinned))
    missing = sorted(set(pinned) - set(upd_types))
    retyped = {
        c: (pinned[c], upd_types[c])
        for c in set(upd_types) & set(pinned)
        if upd_types[c] != pinned[c]
    }
    raise ValueError(
        f"merge_into: batch schema drift vs the stored schema at "
        f"{target_path}: extra columns {extra}, missing {missing}, "
        f"retyped {retyped} (stored, batch) — align the batch, or evolve "
        "the stored schema explicitly with plans.merge.evolve_schema("
        "add=..., widen=...) before merging the drifted batch"
    )


def _recover_whole_dir(fs, jvm_path, target_path: str) -> None:
    """Legacy-flavor crash recovery (r6 review): a prior run that died
    between the two swap renames left the only copy of the table at
    __old and no target — restore it BEFORE any read, or the caller
    would take the "first batch" path and later cleanup would delete
    the sole surviving state."""
    old = target_path.rstrip("/") + ".__old"
    if not fs.exists(jvm_path(target_path)) and fs.exists(jvm_path(old)):
        if not fs.rename(jvm_path(old), jvm_path(target_path)):
            raise IOError(
                f"merge_into: crash recovery rename {old} -> {target_path} failed"
            )


def _portable_merge(
    spark, fs, jvm_path, target_path, updates, keys,
    order_exprs, row_hash, is_delete, num_buckets, protocol,
    commit_meta: dict | None = None, expect_seq: int | None = None,
) -> dict:
    """Layout dispatch + the legacy whole-dir flavor.  Runs UNDER the
    writer lease (acquired by merge_into)."""
    from pyspark.sql import Observation
    from pyspark.sql.utils import AnalysisException

    tmp = target_path.rstrip("/") + ".__tmp"
    old = target_path.rstrip("/") + ".__old"

    # ---- manifest-commit dispatch (see MANIFEST_DIR header) ----
    man = _read_manifest(spark, fs, jvm_path, target_path)
    if man is None and protocol == "manifest":
        if num_buckets is None:
            raise ValueError(
                "merge_into: protocol='manifest' requires num_buckets on "
                "first materialization"
            )
        if _read_bucket_spec(spark, fs, jvm_path, target_path) is not None:
            raise ValueError(
                f"merge_into: target {target_path} is rename-bucketed; "
                "protocol='manifest' cannot apply to it — rebuild the table "
                "to switch protocols"
            )
        _init_manifest_table(
            fs, jvm_path, target_path, keys, num_buckets,
            {k: dict(updates.dtypes)[k] for k in keys},
            columns=dict(updates.dtypes),
        )
        man = _read_manifest(spark, fs, jvm_path, target_path)
    if man is not None:
        if protocol == "rename":
            raise ValueError(
                f"merge_into: target {target_path} is manifest-commit; "
                "protocol='rename' cannot apply to it — rebuild the table "
                "to switch protocols"
            )
        man_seq, _, m = man
        _check_layout_compat(
            target_path, keys, updates, m["keys"], m["key_types"],
            num_buckets, int(m["num_buckets"]), spec_columns=m.get("columns"),
        )
        return _manifest_merge(
            spark, fs, jvm_path, target_path, updates, keys,
            order_exprs, row_hash, is_delete, man_seq, m,
            commit_meta=commit_meta, expect_seq=expect_seq,
        )

    if commit_meta is not None or expect_seq is not None:
        # refuse-loudly convention (cf. num_buckets/protocol on Delta):
        # the swap flavors keep no commit metadata and no stable seq —
        # silently dropping either knob would hand an exactly-once
        # consumer neither its cursor nor its CAS
        raise ValueError(
            f"merge_into: commit_meta/expect_seq apply only to "
            f"manifest-commit targets; {target_path} is not one — use "
            "protocol='manifest' on first materialization"
        )

    _recover_whole_dir(fs, jvm_path, target_path)

    # ---- bucketed-layout dispatch (see BUCKETED LAYOUT in docstring) ----
    spec = _read_bucket_spec(spark, fs, jvm_path, target_path)
    if spec is not None:
        if protocol == "manifest":
            raise ValueError(
                f"merge_into: target {target_path} is rename-bucketed; "
                "protocol='manifest' cannot apply to it — rebuild the table "
                "to switch protocols"
            )
        spec_n, spec_keys, spec_types, spec_cols = spec
        _check_layout_compat(
            target_path, keys, updates, spec_keys, spec_types, num_buckets,
            spec_n, spec_columns=spec_cols,
        )
        return _bucketed_merge(
            spark, fs, jvm_path, target_path, updates, keys,
            order_exprs, row_hash, is_delete, spec_n, spec_cols,
        )
    # No spec: a target that nevertheless carries __bucket= partition
    # dirs is AMBIGUOUS (external tampering, or a table from a pre-spec
    # build) — both the legacy path (unionByName would drag __bucket
    # into the schema) and a guessed bucket count (could mis-route
    # keys) are corruption paths, so refuse loudly.  Since the spec is
    # written inside tmp before the swap, normal operation can never
    # produce this state.
    if fs.exists(jvm_path(target_path)) and _has_bucket_dirs(
        fs, jvm_path, target_path
    ):
        raise ValueError(
            f"merge_into: target {target_path} has {BUCKET_COL}= partition "
            f"directories but no {BUCKET_SPEC_FILE}; refusing to guess the "
            "bucket layout — restore the spec or rebuild the table"
        )
    if protocol == "manifest":
        # _init_manifest_table would also refuse (non-fresh target), but
        # the unbucketed-existing case deserves its own message
        raise ValueError(
            f"merge_into: protocol='manifest' requires a fresh target; "
            f"{target_path} exists unbucketed — read it and merge into a "
            "new manifest path instead (no in-place migration)"
        )
    as_buckets = None
    if num_buckets is not None:
        # first materialization on a missing target, or one-time
        # migration of an unbucketed table: run the full legacy merge
        # below but write the result bucket-partitioned, with the spec
        # INSIDE tmp so the swap exposes data + spec atomically.
        as_buckets = num_buckets

    # ONLY the read sits in the try: a schema mismatch in unionByName
    # must raise loudly — swallowing it as "no target yet" would
    # replace the whole table with just the malformed batch.
    try:
        current = spark.read.parquet(target_path)
    except AnalysisException as e:
        if not _is_empty_read(e):
            raise
        current = None  # first batch: no target yet
    if current is not None:
        # plain flavor has no layout spec — the LIVE table schema is the
        # pin (see _check_schema_pin: unionByName would catch the name
        # drift below, but a retyped column silently type-coerces)
        _check_schema_pin(target_path, dict(current.dtypes), dict(updates.dtypes))
    # TOMBSTONE CONTRACT (see docstring): __del is computed on the
    # UPDATE rows only, NULL-normalized; target rows carry False so a
    # stored key can only disappear when a newer update row deletes it —
    # exactly what Delta's whenMatchedDelete can and cannot do.
    upd_tagged = updates.withColumn("__tgt_pri", F.lit(0)).withColumn(
        "__del", F.coalesce(is_delete.cast("boolean"), F.lit(False))
    )
    merged = _lww_union(current, upd_tagged, keys, order_exprs, row_hash)
    obs = Observation()
    merged = merged.observe(obs, F.count(F.lit(1)).alias("n"))
    if as_buckets is not None:
        # stale-tmp delete (r11 review): under
        # spark.sql.sources.partitionOverwriteMode=dynamic,
        # mode("overwrite") replaces only the partitions the write
        # PRODUCES — a crashed earlier run's leftover bucket dirs in tmp
        # would survive and be swapped into the new table as ghost rows
        fs.delete(jvm_path(tmp), True)
        merged = merged.withColumn(BUCKET_COL, bucket_expr(keys, as_buckets))
        merged.write.mode("overwrite").partitionBy(BUCKET_COL).parquet(tmp)
        # spec rides in tmp: the swap below exposes data + spec in ONE
        # rename, so no crash point leaves a spec-less bucketed layout
        _write_bucket_spec(
            fs, jvm_path, tmp, keys, as_buckets,
            {k: dict(updates.dtypes)[k] for k in keys},
            columns=dict(updates.dtypes),
        )
    else:
        merged.write.mode("overwrite").parquet(tmp)
    _swap_whole_dir(fs, jvm_path, target_path, tmp, old)
    if as_buckets is not None:
        return {
            "engine": "parquet-swap",
            "rows": obs.get["n"],
            "num_buckets": as_buckets,
        }
    return {"engine": "parquet-swap", "rows": obs.get["n"]}


def _swap_whole_dir(fs, jvm_path, target_path: str, tmp: str, old: str) -> None:
    """Whole-directory rename-aside swap (the legacy flavor's commit;
    also reused by rebucket's rename arm).  Swap via rename-aside, not
    delete-then-rename: with _recover_whole_dir at every entry point,
    every crash point leaves a readable state — the old table (crash
    before the second rename; restored on next run) or the new one;
    only the cleanup of __old can be lost, and a leftover __old while
    the target EXISTS is provably stale."""
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


def _has_bucket_dirs(fs, jvm_path, target_path: str) -> bool:
    prefix = BUCKET_COL + "="
    for st in fs.listStatus(jvm_path(target_path)):
        if st.getPath().getName().startswith(prefix):
            return True
    return False


def _ckpt_with_touched(
    updates: DataFrame, keys: list[str], n_buckets: int, is_delete: Column
) -> tuple[DataFrame, list]:
    """Tag the batch with its bucket id, eagerly checkpoint it, and
    return ``(pinned_batch, sorted touched bucket ids)`` in ONE job:
    the touched set rides the checkpoint materialization as an
    ``Observation`` (collect_set) instead of a second
    distinct-collect job over the checkpoint (r15 — the merge
    protocols are per-action-latency-bound on micro-batches; this
    drops one driver round trip per merge).  The eager checkpoint
    stays load-bearing: the batch is consumed again by the LWW union,
    and a non-deterministic source re-evaluating between passes could
    otherwise emit rows into buckets missing from ``touched`` (rows
    silently dropped at swap time).  The observed set is computed ON
    the very materialization the union reads — the same rows by
    construction."""
    from pyspark.sql import Observation

    obs = Observation()
    upd_tagged = (
        updates.withColumn(BUCKET_COL, bucket_expr(keys, n_buckets))
        .withColumn("__tgt_pri", F.lit(0))
        .withColumn("__del", F.coalesce(is_delete.cast("boolean"), F.lit(False)))
        .observe(obs, F.collect_set(BUCKET_COL).alias("touched"))
        .localCheckpoint(eager=True)
    )
    return upd_tagged, sorted(obs.get["touched"])


def _bucketed_merge(
    spark,
    fs,
    jvm_path,
    target_path: str,
    updates: DataFrame,
    keys: list[str],
    order_exprs: list[Column],
    row_hash: Column,
    is_delete: Column,
    n_buckets: int,
    spec_cols: dict | None = None,
) -> dict:
    """Incremental merge into a key-hash-bucketed parquet target: read,
    merge, and swap ONLY the bucket directories the update batch
    touches.  See merge_into's BUCKETED LAYOUT docstring section for
    the layout, cost, and crash contracts.  ``spec_cols`` (r13): the
    layout's schema pin — the touched-bucket read conforms to it so
    files written BEFORE a metadata-only ``evolve_schema(add=...)``
    contribute typed NULLs for the added columns."""
    from pyspark.sql import Observation

    tgt = target_path.rstrip("/")
    tmp = tgt + ".__tmp"
    old = tgt + ".__old"
    prefix = BUCKET_COL + "="

    _recover_buckets(fs, jvm_path, tgt)

    # Eager checkpoint + touched-bucket set in one job (r15; see
    # _ckpt_with_touched for the determinism contract the checkpoint
    # carries).  The batch is micro-batch-sized, not table-sized.
    upd_tagged, touched = _ckpt_with_touched(updates, keys, n_buckets, is_delete)
    try:
        if not touched:  # empty batch: nothing to read, write, or swap
            return {
                "engine": "parquet-bucketed",
                "rows": None,
                "touched_rows": 0,
                "touched_buckets": [],
                "num_buckets": n_buckets,
            }

        # Touched-path read (r11 review): reading the table ROOT would run
        # partition discovery over every bucket directory — an O(N) listing
        # per micro-batch on an object store even though the isin prunes the
        # scan.  Instead probe exactly the touched bucket dirs (O(touched)
        # filesystem calls) and read only those paths; basePath keeps the
        # __bucket partition column in the schema.  A touched bucket with no
        # dir (new keys / previously emptied) simply contributes no current
        # rows.
        existing = [
            tgt + "/" + f"{prefix}{b}"
            for b in touched
            if fs.exists(jvm_path(tgt + "/" + f"{prefix}{b}"))
        ]
        if existing:
            # pinned read (r14-opt; was mergeSchema + conform, r13):
            # post-evolve, files written before a metadata-only add
            # lack the added column — the pin is the deterministic
            # union schema and the reader fills NULLs
            current = _pinned_read(spark, existing, spec_cols, base_path=tgt)
        else:
            current = None
        merged = _lww_union(current, upd_tagged, keys, order_exprs, row_hash)
        obs = Observation()
        merged = merged.observe(obs, F.count(F.lit(1)).alias("n"))
        # stale-tmp delete: see the as_buckets write above (dynamic
        # partitionOverwriteMode keeps crashed-run bucket dirs otherwise)
        fs.delete(jvm_path(tmp), True)
        merged.write.mode("overwrite").partitionBy(BUCKET_COL).parquet(tmp)

        # Per-bucket rename-aside swap over ONLY the touched buckets.  A
        # bucket emptied by deletes has no tmp dir — its aside is moved
        # out, nothing replaces it, and the bucket disappears; the
        # EMPTIED marker written BEFORE that aside-move lets recovery
        # tell this apart from a crash between the two renames (ADVICE
        # r11 — without it, recovery would resurrect the deleted rows).
        fs.delete(jvm_path(old), True)
        fs.mkdirs(jvm_path(old))
        for b in touched:
            name = f"{prefix}{b}"
            t_b = jvm_path(tgt + "/" + name)
            m_b = jvm_path(tmp + "/" + name)
            o_b = jvm_path(old + "/" + name)
            has_new = fs.exists(m_b)
            if not has_new and fs.exists(t_b):
                mk = fs.create(jvm_path(old + "/" + name + EMPTIED_SUFFIX), True)
                mk.close()
            if fs.exists(t_b) and not fs.rename(t_b, o_b):
                raise IOError(f"merge_into: could not move {tgt}/{name} aside")
            if has_new and not fs.rename(m_b, t_b):
                if fs.exists(o_b):  # put the pre-merge bucket back
                    fs.rename(o_b, t_b)
                raise IOError(f"merge_into: could not swap {tmp}/{name} into place")
        fs.delete(jvm_path(old), True)
        fs.delete(jvm_path(tmp), True)
        return {
            "engine": "parquet-bucketed",
            "rows": None,  # no full-table count — that scan is what this path avoids
            "touched_rows": obs.get["n"],
            "touched_buckets": touched,
            "num_buckets": n_buckets,
        }
    finally:
        _release_checkpoint(upd_tagged)


def _recover_buckets(fs, jvm_path, tgt: str) -> None:
    """Per-bucket crash recovery (mirrors the legacy whole-dir rule),
    run at the head of every bucketed merge and of rebucket: an aside
    bucket whose target slot is EMPTY is the sole surviving copy (crash
    between the two renames) — restore it, UNLESS its EMPTIED marker is
    present (the bucket was deleted down to nothing by design; restoring
    would undo the deletes — ADVICE r11); an aside whose target slot is
    occupied is provably stale (the tmp rename landed) — drop it.

    NOTE a failed MULTI-bucket merge must be REPLAYED (same batch)
    before applying any new batch: recovery leaves each bucket
    individually consistent but possibly MIXED across buckets (some
    pre-merge, some post-merge); replaying the idempotent LWW batch
    converges every bucket to post-merge."""
    old = tgt + ".__old"
    prefix = BUCKET_COL + "="
    if not fs.exists(jvm_path(old)):
        return
    entries = list(fs.listStatus(jvm_path(old)))
    names = {st.getPath().getName() for st in entries}
    for st in entries:
        name = st.getPath().getName()
        if not name.startswith(prefix) or name.endswith(EMPTIED_SUFFIX):
            continue  # markers themselves go with the old-dir delete below
        dest = jvm_path(tgt + "/" + name)
        if fs.exists(dest) or (name + EMPTIED_SUFFIX) in names:
            fs.delete(st.getPath(), True)
        elif not fs.rename(st.getPath(), dest):
            raise IOError(
                f"merge_into: bucket crash-recovery rename "
                f"{old}/{name} -> {tgt}/{name} failed"
            )
    fs.delete(jvm_path(old), True)


# ---------------------------------------------------------------------------
# Manifest-commit flavor (r11 verdict #1).  Layout:
#
#   <target>/_manifest/<seq:020d>-<gen>.json   committed manifests
#   <target>/_manifest/.tmp-<gen>.json         in-flight commit (ignored)
#   <target>/__bucket=K/__gen=<gen>/part-*.parquet
#
# The manifest pins {num_buckets, keys, key_types, buckets: {K: gen}}.
# A bucket absent from `buckets` is empty.  Generation directories are
# NON-LIVE until a manifest referencing them is committed, so every
# write before the commit is crash-garbage at worst; the commit itself
# is one single-FILE rename (atomic on local/HDFS; a single-object copy
# on S3A — the destination appears complete or not at all, unlike the
# rename flavor's non-atomic O(data) directory copy+delete).  Readers
# resolve live paths through read_merged_table; superseded generations
# and manifests are collected by vacuum_merged_table.
# ---------------------------------------------------------------------------


def _manifest_dir(tgt: str) -> str:
    return tgt.rstrip("/") + "/" + MANIFEST_DIR


def _list_manifests(fs, jvm_path, tgt: str) -> list:
    """Sorted [(seq, filename)] of committed manifests; [] when none.
    Committed names are the bare zero-padded seq (``<seq:020d>.json``);
    a ``-suffix`` after the seq is tolerated for forward compat."""
    mdir = _manifest_dir(tgt)
    if not fs.exists(jvm_path(mdir)):
        return []
    out = []
    for st in fs.listStatus(jvm_path(mdir)):
        name = st.getPath().getName()
        if name.startswith(".") or not name.endswith(".json"):
            continue
        head = name[: -len(".json")].split("-", 1)[0]
        if head.isdigit():
            out.append((int(head), name))
    return sorted(out)


def _read_manifest(spark, fs, jvm_path, target_path: str, as_of_seq: int | None = None):
    """Return (seq, filename, manifest_dict) for the LATEST committed
    manifest, or None when the target carries no manifest layout.  An
    existing-but-unreadable latest manifest raises loudly (same refusal
    convention as _read_bucket_spec): guessing would either read stale
    generations or route keys into the wrong bucket space.

    ``as_of_seq`` (r12 snapshot reads) selects the latest manifest with
    ``seq <= as_of_seq`` instead — Delta ``versionAsOf`` semantics.  A
    manifest layout with no commit at-or-below the requested seq raises
    (the snapshot predates the table, or vacuum already collected it);
    returning the oldest retained state instead would silently answer a
    different question.  A seq BEYOND the newest commit raises too
    (ADVICE r12, matching Delta's versionAsOf on a nonexistent future
    version): a typo'd or wrong-table seq must not silently read the
    latest state as if it were the requested snapshot."""
    ms = _list_manifests(fs, jvm_path, target_path.rstrip("/"))
    if not ms:
        return None
    if as_of_seq is not None:
        if as_of_seq > ms[-1][0]:
            raise ValueError(
                f"read_merged_table: as_of_seq={as_of_seq} is beyond the "
                f"latest commit (seq {ms[-1][0]}) of {target_path} — like "
                "Delta versionAsOf, a nonexistent future version is an "
                "error, not the latest state; drop as_of_seq to read latest"
            )
        ms = [m for m in ms if m[0] <= as_of_seq]
        if not ms:
            raise ValueError(
                f"read_merged_table: no manifest at or below seq {as_of_seq} "
                f"for {target_path} — the snapshot predates the table or was "
                "vacuumed; list_snapshots() shows what is retained"
            )
    seq, name = ms[-1]
    path = _manifest_dir(target_path) + "/" + name
    try:
        stm = fs.open(jvm_path(path))
        try:
            raw = bytes(spark._jvm.org.apache.commons.io.IOUtils.toByteArray(stm))
        finally:
            stm.close()
        man = json.loads(raw)
        for field in ("num_buckets", "keys", "key_types", "buckets"):
            if field not in man:
                raise KeyError(field)
        return seq, name, man
    except Exception as e:
        raise ValueError(
            f"merge_into: unreadable/corrupt manifest at {path} ({e!r}); "
            "refusing to guess the table state — repair or remove the table"
        ) from e


def _commit_manifest(fs, jvm_path, tgt: str, seq: int, gen: str, man: dict) -> None:
    """Atomically commit a manifest: write to a dot-prefixed tmp file,
    then ONE file rename to the seq-ordered final name.  The rename is
    the commit point; a crash on either side leaves the previous
    manifest live and at most a .tmp-* straggler for vacuum.

    The final name is the BARE seq (``<seq:020d>.json``), deliberately
    collision-prone: it makes the commit an atomic SEQ CLAIM.  A slow
    (not dead) writer resuming after a stale-lease takeover committed
    past it would otherwise land a second manifest at the same seq
    under a different gen-suffixed name — no filesystem conflict, and
    whichever sorted later would silently shadow the other batch.
    With the bare-seq name the straggler's rename fails (dest exists /
    rename returns false) and it dies loudly instead; its staged
    generations are vacuum fodder and its batch gets replayed."""
    mdir = _manifest_dir(tgt)
    fs.mkdirs(jvm_path(mdir))
    payload = json.dumps(man).encode("utf-8")
    tmp_p = jvm_path(mdir + f"/.tmp-{gen}.json")
    out = fs.create(tmp_p, True)
    try:
        out.write(bytearray(payload))
    finally:
        out.close()
    final = jvm_path(mdir + f"/{seq:020d}.json")
    if fs.exists(final) or not fs.rename(tmp_p, final):
        fs.delete(tmp_p, False)
        raise IOError(
            f"merge_into: manifest commit {mdir}/{seq:020d}.json failed — "
            "seq already claimed (a concurrent writer committed past this "
            "one, e.g. after a stale-lease takeover); replay the batch"
        )


APP_META_KEY = "app_meta"


def _carry_app_meta(man: dict) -> dict:
    """The application-owned manifest field (``merge_into(commit_meta=)``)
    rides EVERY later commit unchanged until the next commit_meta merge
    replaces it.  Maintenance and evolve commits must never drop it: an
    exactly-once consumer (plans/ivm.refresh_aggregate) keeps its source
    cursor here, and a compaction that silently shed the cursor would
    rewind the consumer into a double-apply."""
    return {APP_META_KEY: man[APP_META_KEY]} if APP_META_KEY in man else {}


def _new_gen() -> str:
    """Generation id: 'g' prefix guarantees the __gen partition value is
    inferred as STRING (an all-digit hex id would infer as int and make
    the read schema depend on the draw)."""
    import uuid

    return "g" + uuid.uuid4().hex[:12]


def _init_manifest_table(
    fs, jvm_path, target_path: str, keys, num_buckets: int, key_types: dict,
    columns: dict | None = None,
) -> None:
    """Materialize an EMPTY manifest table (seq 0, no live buckets); the
    first batch is then an ordinary manifest merge against empty state —
    one code path for first and every later batch.  Idempotent across a
    crash mid-init: re-init is allowed while the target holds nothing
    but an uncommitted _manifest dir."""
    tgt = target_path.rstrip("/")
    if fs.exists(jvm_path(tgt)):
        entries = [st.getPath().getName() for st in fs.listStatus(jvm_path(tgt))]
        if any(e != MANIFEST_DIR for e in entries) or _list_manifests(
            fs, jvm_path, tgt
        ):
            raise ValueError(
                f"merge_into: protocol='manifest' requires a fresh target; "
                f"{tgt} already holds {entries} — rebuild into a new path"
            )
    gen = _new_gen()
    _commit_manifest(
        fs, jvm_path, tgt, 0, gen,
        {
            "num_buckets": int(num_buckets),
            "keys": list(keys),
            "key_types": dict(key_types),
            **({"columns": dict(columns)} if columns is not None else {}),
            "buckets": {},
            "seq": 0,
            "gen": gen,
        },
    )


def _manifest_merge(
    spark, fs, jvm_path, target_path: str, updates, keys,
    order_exprs, row_hash, is_delete, man_seq: int, man: dict,
    commit_meta: dict | None = None, expect_seq: int | None = None,
) -> dict:
    """Incremental merge under the manifest-commit protocol: read ONLY
    the touched buckets' live generations, merge, write fresh (non-live)
    generation dirs, then commit one manifest.  Crash contract: the
    table reads as exactly pre-merge until the manifest rename lands and
    exactly post-merge after — every earlier crash point strands only
    unreferenced generation dirs / a .tmp manifest (vacuum fodder), and
    the batch replay converges (LWW idempotence), with no recovery pass
    needed at all.  Cost model matches the rename flavor: O(touched
    bucket bytes + batch) per call, O(touched) filesystem calls."""
    from pyspark.sql import Observation

    tgt = target_path.rstrip("/")
    if expect_seq is not None and man_seq != expect_seq:
        # optimistic CAS (r14): a read-modify-write planner (e.g. the
        # IVM refresh, which adds deltas onto values it looked up at
        # plan time) must refuse when its basis moved — applying its
        # rows onto a NEWER state would double-count, and the lease
        # only serializes the merges, not the planning reads.
        raise ValueError(
            f"merge_into: expect_seq={expect_seq} but the latest committed "
            f"manifest of {tgt} is seq {man_seq} — the state this batch was "
            "planned against has moved; re-plan from the current state and "
            "retry"
        )
    meta_fields = (
        {APP_META_KEY: commit_meta}
        if commit_meta is not None
        else _carry_app_meta(man)
    )
    tmp = tgt + ".__tmp"
    prefix = BUCKET_COL + "="
    n_buckets = int(man["num_buckets"])
    live = dict(man["buckets"])

    # Eager checkpoint + touched-bucket set in one job (r15) — same
    # non-deterministic-source rationale as the rename flavor.
    upd_tagged, touched = _ckpt_with_touched(updates, keys, n_buckets, is_delete)
    try:
        if not touched:
            if commit_meta is not None:
                # an explicit commit_meta must land even with zero data
                # rows: a METADATA-ONLY commit (live map unchanged) lets
                # an exactly-once consumer advance its cursor past a
                # range that netted out to nothing
                gen = _new_gen()
                _commit_manifest(
                    fs, jvm_path, tgt, man_seq + 1, gen,
                    {
                        "num_buckets": n_buckets,
                        "keys": list(man["keys"]),
                        "key_types": dict(man["key_types"]),
                        **({"columns": man["columns"]} if "columns" in man
                           else {}),
                        **meta_fields,
                        "buckets": live,
                        "seq": man_seq + 1,
                        "gen": gen,
                    },
                )
                return {
                    "engine": "parquet-manifest",
                    "rows": None,
                    "touched_rows": 0,
                    "touched_buckets": [],
                    "num_buckets": n_buckets,
                    "seq": man_seq + 1,
                }
            return {
                "engine": "parquet-manifest",
                "rows": None,
                "touched_rows": 0,
                "touched_buckets": [],
                "num_buckets": n_buckets,
                "seq": man_seq,
            }
        existing = [
            f"{tgt}/{prefix}{b}/{GEN_COL}={live[str(b)]}"
            for b in touched
            if str(b) in live
        ]
        if existing:
            # pinned read (r14-opt; was mergeSchema + conform, r13): a
            # metadata-only evolve_schema(add=...) leaves older live
            # generations without the added column — the reader
            # null-fills from the pin, no footer-union job
            current = _pinned_read(
                spark, existing, man.get("columns"), base_path=tgt
            ).drop(GEN_COL)
        else:
            current = None
        merged = _lww_union(current, upd_tagged, keys, order_exprs, row_hash)
        obs = Observation()
        merged = merged.observe(obs, F.count(F.lit(1)).alias("n"))
        # stale-tmp delete: dynamic partitionOverwriteMode would keep a
        # crashed run's leftover bucket dirs in tmp otherwise
        fs.delete(jvm_path(tmp), True)
        merged.write.mode("overwrite").partitionBy(BUCKET_COL).parquet(tmp)

        # Stage fresh generations (NON-LIVE until the manifest commit):
        # rename each produced tmp bucket under its bucket dir as a new
        # __gen.  These renames need not be atomic — nothing resolves
        # them until the commit below — which is exactly what makes this
        # flavor safe where directory renames are copy+delete (S3A).
        gen = _new_gen()
        new_live = dict(live)
        for b in touched:
            name = f"{prefix}{b}"
            m_b = jvm_path(tmp + "/" + name)
            if fs.exists(m_b):
                fs.mkdirs(jvm_path(tgt + "/" + name))
                dest = jvm_path(tgt + "/" + name + "/" + f"{GEN_COL}={gen}")
                if not fs.rename(m_b, dest):
                    raise IOError(
                        f"merge_into: could not stage generation "
                        f"{tgt}/{name}/{GEN_COL}={gen}"
                    )
                new_live[str(b)] = gen
            else:  # bucket emptied by deletes: drop it from the live map
                new_live.pop(str(b), None)
        _commit_manifest(
            fs, jvm_path, tgt, man_seq + 1, gen,
            {
                "num_buckets": n_buckets,
                "keys": list(man["keys"]),
                "key_types": dict(man["key_types"]),
                **({"columns": man["columns"]} if "columns" in man else {}),
                **meta_fields,
                "buckets": new_live,
                "seq": man_seq + 1,
                "gen": gen,
            },
        )
        fs.delete(jvm_path(tmp), True)  # post-commit cleanup (loss = vacuum fodder)
        return {
            "engine": "parquet-manifest",
            "rows": None,  # no full-table count — that scan is what this path avoids
            "touched_rows": obs.get["n"],
            "touched_buckets": touched,
            "num_buckets": n_buckets,
            "seq": man_seq + 1,
        }
    finally:
        _release_checkpoint(upd_tagged)


def read_merged_table(
    spark,
    target_path: str,
    as_of_seq: int | None = None,
    as_of_ms: int | None = None,
):
    """Read the merged state of a merge_into target under ANY portable
    layout — manifest-commit (resolved through the latest manifest),
    rename-bucketed, or plain parquet.  Returns None when the target
    does not exist or holds no data files (the all-deleted / never-
    written state).  Manifest targets MUST be read through this resolver
    (or an equivalent manifest-aware reader): a plain root read would
    see every retained generation at once and double-count rows.  The
    __bucket partition column is exposed on bucketed layouts (both
    flavors); __gen is resolved away.

    ``as_of_seq`` (r12): SNAPSHOT read — resolve through the latest
    manifest with ``seq <= as_of_seq`` (Delta ``versionAsOf``; the seq
    is what ``merge_into`` returns in its metrics), turning the
    protocol's natural generation retention into time travel for
    audit/debug reads of pre-batch state.  Snapshot lifetime is bounded
    by ``vacuum_merged_table``: a vacuumed snapshot's manifest is gone
    (raises here) or its generations are gone (spark.read raises
    PATH_NOT_FOUND at scan) — both loud, never a silently-wrong state;
    ``grace_sec`` shields snapshots resolved before the vacuum the same
    way it shields latest-manifest readers.  Only manifest targets keep
    history: passing ``as_of_seq`` for the rename/plain layouts raises
    (their swap protocols destroy superseded state at commit).

    ``as_of_ms`` (Delta ``timestampAsOf`` analog): resolve the latest
    manifest COMMITTED at or before the given epoch-millis instant,
    via the manifest files' modification times — the commit rename is
    the manifest's last write, so mtime IS the commit instant on a
    filesystem that preserves it (caveat: an out-of-band copy/restore
    of the table resets mtimes; seq-based selection is the robust
    form).  Mutually exclusive with ``as_of_seq``.  Both forms RAISE
    beyond the newest commit (a future seq / instant), matching
    Delta's versionAsOf/timestampAsOf — never a silent clamp."""
    from pyspark.sql.utils import AnalysisException

    jvm_path = spark._jvm.org.apache.hadoop.fs.Path
    fs = jvm_path(target_path).getFileSystem(spark._jsc.hadoopConfiguration())
    tgt = target_path.rstrip("/")
    if as_of_ms is not None:
        if as_of_seq is not None:
            raise ValueError(
                "read_merged_table: pass as_of_seq OR as_of_ms, not both"
            )
        try:
            snaps = list_snapshots(spark, tgt)
        except ValueError as e:
            # same user mistake as as_of_seq on a non-manifest target —
            # surface the same read_merged_table-prefixed explanation
            # instead of list_snapshots' internal message (ADVICE r12)
            raise ValueError(
                f"read_merged_table: as_of_ms={as_of_ms} requested but {tgt} "
                "is not a manifest-commit target — only the manifest layout "
                "retains superseded state (rename/plain swaps destroy it)"
            ) from e
        latest_ms = max(s["committed_ms"] for s in snaps)
        if as_of_ms > latest_ms:
            raise ValueError(
                f"read_merged_table: as_of_ms={as_of_ms} is after the latest "
                f"commit instant ({latest_ms}) of {tgt} — like Delta "
                "timestampAsOf, an instant beyond the newest commit is an "
                "error, not the latest state; drop as_of_ms to read latest"
            )
        eligible = [s["seq"] for s in snaps if s["committed_ms"] <= as_of_ms]
        if not eligible:
            raise ValueError(
                f"read_merged_table: no manifest committed at or before "
                f"epoch-ms {as_of_ms} for {tgt} — the instant predates the "
                "table or the snapshot was vacuumed; list_snapshots() shows "
                "what is retained"
            )
        as_of_seq = max(eligible)
    man = _read_manifest(spark, fs, jvm_path, tgt, as_of_seq=as_of_seq)
    if man is None and as_of_seq is not None:
        raise ValueError(
            f"read_merged_table: as_of_seq={as_of_seq} requested but {tgt} "
            "is not a manifest-commit target — only the manifest layout "
            "retains superseded state (rename/plain swaps destroy it)"
        )
    if man is not None:
        _, _, m = man
        if not m["buckets"]:
            return None
        paths = [
            f"{tgt}/{BUCKET_COL}={b}/{GEN_COL}={g}"
            for b, g in sorted(m["buckets"].items(), key=lambda kv: int(kv[0]))
        ]
        # a listed-but-missing generation is corruption (vacuum bug /
        # tampering): spark.read raises PATH_NOT_FOUND loudly — correct.
        # pinned read (r14-opt): the manifest's own columns pin is the
        # schema of its live generations (a PRE-pin table falls back to
        # the deterministic mergeSchema union inside _pinned_read).
        return _pinned_read(
            spark, paths, m.get("columns"), base_path=tgt
        ).drop(GEN_COL)
    # rename-bucketed flavor: when the layout pins a schema, read the
    # deterministic column union and conform (files written before a
    # metadata-only evolve_schema add lack the added columns) — same
    # seam as the manifest branch above
    spec = _read_bucket_spec(spark, fs, jvm_path, tgt)
    if spec is not None and spec[3] is not None:
        try:
            return _conform_to_pin(
                spark.read.option("mergeSchema", "true").parquet(tgt), spec[3]
            )
        except AnalysisException as e:
            if _is_empty_read(e):  # spec'd but zero data files
                return None
            raise
    try:
        return spark.read.parquet(tgt)
    except AnalysisException as e:
        if _is_empty_read(e):  # no table at this path
            return None
        raise


def list_snapshots(spark, target_path: str) -> list[dict]:
    """Retained snapshots of a manifest-commit target, oldest first:
    ``[{"seq": int, "committed_ms": int}]`` — every seq here is valid
    for ``read_merged_table(..., as_of_seq=seq)`` until a vacuum
    collects it (retention = the vacuum cadence and grace the operator
    chose; the protocol itself never deletes).  Pure filesystem stats,
    no Spark job.  Raises on a non-manifest target — the other layouts
    retain no history to list."""
    jvm_path = spark._jvm.org.apache.hadoop.fs.Path
    fs = jvm_path(target_path).getFileSystem(spark._jsc.hadoopConfiguration())
    tgt = target_path.rstrip("/")
    ms = _list_manifests(fs, jvm_path, tgt)
    if not ms:
        raise ValueError(
            f"list_snapshots: {tgt} is not a manifest-commit target"
        )
    mdir = _manifest_dir(tgt)
    return [
        {
            "seq": seq,
            "committed_ms": fs.getFileStatus(
                jvm_path(mdir + "/" + name)
            ).getModificationTime(),
        }
        for seq, name in ms
    ]


def read_commit_meta(
    spark, target_path: str, as_of_seq: int | None = None
) -> tuple[int, dict | None]:
    """``(seq, app_meta)`` of the latest (or as-of) committed manifest:
    the read side of ``merge_into(commit_meta=...)``.  ``app_meta`` is
    None when no commit ever carried one.  Raises on a non-manifest
    target (the swap flavors keep no commit metadata) with the same
    seq-resolution refusals as :func:`read_merged_table`."""
    jvm_path = spark._jvm.org.apache.hadoop.fs.Path
    fs = jvm_path(target_path).getFileSystem(spark._jsc.hadoopConfiguration())
    man = _read_manifest(spark, fs, jvm_path, target_path.rstrip("/"),
                         as_of_seq=as_of_seq)
    if man is None:
        raise ValueError(
            f"read_commit_meta: {target_path} is not a manifest-commit "
            "merge target — only the manifest flavor carries commit "
            "metadata (merge_into(protocol='manifest', commit_meta=...))"
        )
    seq, _, m = man
    return seq, m.get(APP_META_KEY)


CHANGE_TYPE_COL = "_change_type"


def read_changes(
    spark,
    target_path: str,
    from_seq: int,
    to_seq: int | None = None,
) -> DataFrame | None:
    """NET change feed between two committed snapshots of a
    manifest-commit merge target — the Delta Change Data Feed /
    Iceberg incremental-read analog, derived from the protocol's
    retained generations (no per-commit change files are ever
    written).  Returns the table's columns in the TO snapshot's schema
    plus ``_change_type`` ∈ {'insert', 'update_preimage',
    'update_postimage', 'delete'}:

    - a key resolved at TO but not at FROM → one ``insert`` row
      (post-image);
    - a key resolved at FROM but not at TO → one ``delete`` row
      (pre-image — the winning tombstone removed it);
    - a key resolved at both with ANY value column differing → one
      ``update_preimage`` + one ``update_postimage`` row;
    - a key whose resolved row is identical does not appear at all.

    NET means per-KEY, not per-commit: a key touched by several
    commits in (FROM, TO] appears once, as the transition between its
    resolved states — exactly what an incremental downstream consumer
    (the point of the feed at 100 TB) needs to converge, and exactly
    what makes the reconstruction law hold:
    ``snapshot(FROM) − {delete, update_preimage keys} ∪ {insert,
    update_postimage rows} == snapshot(TO)``
    (pinned in tests/test_read_changes.py, incl. as a hypothesis
    property over random merge/evolve/maintenance interleavings).

    Both seqs use as-of resolution (latest manifest ≤ seq, the
    read_merged_table convention); a seq beyond the newest commit or
    below the vacuum horizon raises there.  ``to_seq=None`` reads the
    latest commit.  Equal resolved seqs → an EMPTY frame (or None when
    the target retains neither a schema pin nor any live data to type
    one — the read_merged_table None-for-empty convention).

    Scale: generation directories are immutable, so a bucket whose
    live generation is the SAME in both manifests provably holds
    identical state and is never read — the scan is O(buckets touched
    in the range), not O(table).  Pruning is a pure optimization,
    never load-bearing: a rebucket in the range (bucket spaces not
    comparable) falls back to the full live map on each side, and a
    compaction in the range (same state, fresh gen ids) just reads
    buckets that diff to zero rows.  The key-diff itself is one
    null-safe full-outer join, no driver-side row handling.

    Schema evolution in the range reads like Delta CDF: both sides
    are conformed to the TO snapshot's pin — a metadata-only added
    column reads as typed NULL on the FROM side (so an unchanged key
    does NOT appear just because the schema grew), and a widened
    column is losslessly cast up (the widen lattice guarantees
    exactness), so a pre-widen pre-image compares in the TO type.

    Reads take no lease (same as every reader); retention is the
    vacuum grace the operator chose.  Raises on a non-manifest target
    (the rename/plain swap protocols destroy superseded state) and on
    a table whose schema already carries ``_change_type``."""
    from functools import reduce as _reduce

    jvm_path = spark._jvm.org.apache.hadoop.fs.Path
    fs = jvm_path(target_path).getFileSystem(spark._jsc.hadoopConfiguration())
    tgt = target_path.rstrip("/")

    def _resolve(seq, bound):
        # _read_manifest's seq-resolution refusals (beyond-newest,
        # vacuumed) speak as read_merged_table; re-prefix so the caller
        # sees which read_changes BOUND was bad (ADVICE-r12 convention)
        try:
            return _read_manifest(spark, fs, jvm_path, tgt, as_of_seq=seq)
        except ValueError as e:
            raise ValueError(
                f"read_changes: {bound}={seq} — "
                + str(e).replace("read_merged_table: ", "", 1)
            ) from e

    man_a = _resolve(from_seq, "from_seq")
    if man_a is None:
        raise ValueError(
            f"read_changes: {tgt} is not a manifest-commit target — only "
            "the manifest layout retains the superseded state a change "
            "feed diffs (rename/plain swaps destroy it)"
        )
    seq_a, _, m_a = man_a
    seq_b, _, m_b = _resolve(to_seq, "to_seq")
    if seq_a > seq_b:
        raise ValueError(
            f"read_changes: from_seq resolved to {seq_a}, after to_seq's "
            f"{seq_b} — the feed runs forward; swap the bounds"
        )
    pin = m_b.get("columns")
    if pin is not None and CHANGE_TYPE_COL in pin:
        raise ValueError(
            f"read_changes: the table schema at {tgt} already carries "
            f"the reserved output column {CHANGE_TYPE_COL!r}"
        )
    keys = list(m_b["keys"])

    # Changed-bucket pruning: same bucket space → only buckets whose
    # live generation differs; a rebucket in the range (num_buckets
    # changed) makes bucket ids incomparable → full live map per side.
    live_a, live_b = dict(m_a["buckets"]), dict(m_b["buckets"])
    if seq_a == seq_b:
        sel_a = sel_b = {}
    elif int(m_a["num_buckets"]) == int(m_b["num_buckets"]):
        changed = {
            b for b in set(live_a) | set(live_b)
            if live_a.get(b) != live_b.get(b)
        }
        sel_a = {b: live_a[b] for b in changed if b in live_a}
        sel_b = {b: live_b[b] for b in changed if b in live_b}
    else:
        sel_a, sel_b = live_a, live_b

    def _side(sel: dict):
        if not sel:
            return None
        paths = [
            f"{tgt}/{BUCKET_COL}={b}/{GEN_COL}={g}"
            for b, g in sorted(sel.items(), key=lambda kv: int(kv[0]))
        ]
        df = _conform_to_pin(
            spark.read.option("basePath", tgt)
            .option("mergeSchema", "true")
            .parquet(*paths)
            .drop(GEN_COL),
            pin,
        ).drop(BUCKET_COL)
        if pin is not None:
            # pre-widen FROM-side files carry the narrow type; the
            # widen lattice is lossless-only, so casting up is exact
            df = df.select(
                *[F.col(c).cast(t).alias(c) for c, t in pin.items()]
            )
        return df

    a_state, b_state = _side(sel_a), _side(sel_b)
    if a_state is None and b_state is None:
        if pin is not None:
            return spark.range(0).select(
                *[F.lit(None).cast(t).alias(c) for c, t in pin.items()],
                F.lit(None).cast("string").alias(CHANGE_TYPE_COL),
            )
        full = read_merged_table(spark, tgt, as_of_seq=seq_b)
        if full is None:
            full = read_merged_table(spark, tgt, as_of_seq=seq_a)
        if full is None:
            return None  # no pin, no live data on either side
        return full.drop(BUCKET_COL).limit(0).withColumn(
            CHANGE_TYPE_COL, F.lit(None).cast("string")
        )
    if a_state is None:
        a_state = b_state.limit(0)
    elif b_state is None:
        b_state = a_state.limit(0)
    if pin is None and set(a_state.columns) != set(b_state.columns):
        raise ValueError(
            f"read_changes: pre-pin generations of {tgt} diverge in "
            f"columns between seq {seq_a} ({sorted(a_state.columns)}) and "
            f"seq {seq_b} ({sorted(b_state.columns)}); evolve the table "
            "explicitly (plans.merge.evolve_schema) to pin one schema"
        )
    cols = list(pin) if pin is not None else list(b_state.columns)
    if CHANGE_TYPE_COL in cols:
        raise ValueError(
            f"read_changes: the table schema at {tgt} already carries "
            f"the reserved output column {CHANGE_TYPE_COL!r}"
        )
    val_cols = [c for c in cols if c not in keys]

    def _tagged(df, prefix):
        v = (
            F.struct(*[F.col(c) for c in val_cols])
            if val_cols
            else F.struct(F.lit(True).alias("__all_key_row"))
        )
        return df.select(
            *[F.col(k).alias(f"__{prefix}k{i}") for i, k in enumerate(keys)],
            v.alias(f"__{prefix}v"),
            F.lit(True).alias(f"__{prefix}p"),
        )

    a_t, b_t = _tagged(a_state, "a"), _tagged(b_state, "b")
    cond = _reduce(
        Column.__and__,
        [
            a_t[f"__ak{i}"].eqNullSafe(b_t[f"__bk{i}"])
            for i in range(len(keys))
        ],
    )
    pa = F.coalesce(F.col("__ap"), F.lit(False))
    pb = F.coalesce(F.col("__bp"), F.lit(False))
    va, vb = F.col("__av"), F.col("__bv")

    def _ch(kind, v):
        return F.struct(F.lit(kind).alias("_ct"), v.alias("_v"))

    changes = (
        a_t.join(b_t, cond, "full_outer")
        # unchanged keys (the overwhelming majority even inside changed
        # buckets) drop here, before the explode doubles update rows
        .where(~(pa & pb & va.eqNullSafe(vb)))
        .select(
            *[
                F.coalesce(F.col(f"__ak{i}"), F.col(f"__bk{i}")).alias(k)
                for i, k in enumerate(keys)
            ],
            F.explode(
                F.when(~pa, F.array(_ch("insert", vb)))
                .when(~pb, F.array(_ch("delete", va)))
                .otherwise(
                    F.array(
                        _ch("update_preimage", va),
                        _ch("update_postimage", vb),
                    )
                )
            ).alias("__ch"),
        )
    )
    out_vals = ["__ch._v.*"] if val_cols else []
    return changes.select(
        *keys, *out_vals, F.col("__ch._ct").alias(CHANGE_TYPE_COL)
    ).select(*cols, CHANGE_TYPE_COL)


def lookup_merged_keys(spark, target_path: str, lookup: DataFrame) -> DataFrame:
    """POINT-LOOKUP read: the resolved rows of a merge target for the
    keys in ``lookup`` — exploiting the hash-bucketed layout so a
    k-key lookup reads O(min(k, num_buckets)) buckets instead of the
    table.  This completes the store's read cost model: writes are
    O(touched buckets), the change feed is O(changed buckets), and
    point reads are O(looked-up buckets) — at 100 TB with thousands of
    buckets, a 100-key probe touches ≤100 bucket directories.

    ``lookup`` must carry EXACTLY the layout's key columns at the
    layout's key dtypes (xxhash64 is type-sensitive — the same value
    at another type hashes into the wrong bucket; same refusal as
    merge_into's key-drift gate).  NULL keys route like merge routes
    them (the r13 NULL-routing pin).  Duplicate lookup keys read once
    (semi-join semantics).  Missing keys are simply absent from the
    result — the caller left-joins if it needs misses marked.

    Layouts: manifest — the touched buckets' LIVE generations are
    resolved through the latest manifest and nothing else is listed or
    read; rename-bucketed — a partition filter on ``__bucket`` prunes
    at planning time; plain — no bucket space exists, full scan + the
    same semi-join (correct, documented degradation).  The distinct
    bucket-id collect is bounded by num_buckets, the same bound
    merge_into's touched-bucket collect lives under.  The probe side
    is BROADCAST (point lookups are small by use-case); for a probe
    too big to broadcast, use read_merged_table + a shuffle semi-join
    instead — at that size bucket pruning stops helping anyway."""
    jvm_path = spark._jvm.org.apache.hadoop.fs.Path
    fs = jvm_path(target_path).getFileSystem(spark._jsc.hadoopConfiguration())
    tgt = target_path.rstrip("/")

    man = _read_manifest(spark, fs, jvm_path, tgt)
    if man is not None:
        _, _, m = man
        keys, key_types = list(m["keys"]), dict(m["key_types"])
        n_buckets, pin = int(m["num_buckets"]), m.get("columns")
    else:
        spec = _read_bucket_spec(spark, fs, jvm_path, tgt)
        if spec is not None:
            n_buckets, keys, key_types, pin = spec
        else:
            keys = key_types = None  # plain flavor: no bucket space

    if keys is not None:
        if list(lookup.columns) != list(keys) and sorted(
            lookup.columns
        ) != sorted(keys):
            raise ValueError(
                f"lookup_merged_keys: the layout at {tgt} keys on "
                f"{list(keys)}, the lookup frame carries "
                f"{list(lookup.columns)} — pass exactly the key columns"
            )
        lk_types = dict(lookup.dtypes)
        drift = {
            k: (key_types.get(k), lk_types.get(k))
            for k in keys
            if key_types.get(k) != lk_types.get(k)
        }
        if drift:  # xxhash64 is type-sensitive: same value, other bucket
            raise ValueError(
                f"lookup_merged_keys: key dtype drift vs the layout at "
                f"{tgt}: {drift} (layout, lookup) — the same logical key "
                "would hash into a different bucket space; cast the lookup "
                "keys back to the layout types"
            )
        tagged = lookup.select(
            *keys, bucket_expr(keys, n_buckets).alias(BUCKET_COL)
        )
        # bounded by num_buckets — the merge path's touched-collect bound
        wanted = sorted(
            r[0] for r in tagged.select(BUCKET_COL).distinct().collect()
        )

    if man is not None:
        live = m["buckets"]
        paths = [
            f"{tgt}/{BUCKET_COL}={b}/{GEN_COL}={live[str(b)]}"
            for b in wanted
            if str(b) in live
        ]
        if not paths:
            # no looked-up bucket is live: the result is definitionally
            # empty — type it from the pin when one exists
            if pin is not None:
                return spark.range(0).select(
                    *[F.lit(None).cast(t).alias(c) for c, t in pin.items()]
                )
            return None
        base = _pinned_read(spark, paths, pin, base_path=tgt).drop(GEN_COL)
    else:
        base = read_merged_table(spark, tgt)
        if base is not None and keys is not None:
            # rename flavor: partition pruning does the bucket skip
            base = base.where(F.col(BUCKET_COL).isin([int(b) for b in wanted]))

    if base is None:
        return None
    probe = lookup.select(
        *[F.col(k).alias(f"__lk{i}") for i, k in enumerate(lookup.columns)]
    ).dropDuplicates()
    jkeys = list(lookup.columns)
    cond = None
    for i, k in enumerate(jkeys):
        c = base[k].eqNullSafe(probe[f"__lk{i}"])
        cond = c if cond is None else (cond & c)
    return base.join(F.broadcast(probe), cond, "left_semi")


REPL_META_KEY = "replicate"
SRC_SEQ_COL = "__src_seq"
DELETED_COL = "__deleted"


def replicate_changes(
    spark,
    source_path: str,
    target_path: str,
    num_buckets: int | None = None,
) -> dict:
    """ONE incremental replication step: apply the source's net change
    feed since the persisted cursor onto a downstream manifest-commit
    REPLICA, then advance the cursor — the productionized form of the
    feed's consumer pattern (insert/update_postimage → upsert, delete
    → tombstone, the source seq as the recency column).  The replica
    never re-reads the source in full after the bootstrap; each step
    costs O(buckets touched since the cursor).

    The cursor commits ATOMICALLY with the applied changes, inside the
    replica's own manifest rename (``merge_into(commit_meta=...)``, the
    transactional-offsets pattern; read it back with
    :func:`read_commit_meta`).  This is LOAD-BEARING, not a
    convenience: the original sidecar-cursor design (cursor file
    written AFTER the merge) claimed replay-convergence from LWW
    idempotence, and hypothesis found the counterexample — sync k1,
    crash before the cursor write, source deletes k1; the NET feed
    from the stale cursor shows absent→absent = NO ROW for k1, so the
    replica keeps k1 forever.  Applying net(A→B) is only guaranteed to
    land on state(B) from state(A) or state(B); a lost cursor write
    strands the replica at some state(C), A<C<B, where net changes
    that cancel over (A,B] but not over (C,B] are silently missed.
    With the cursor inside the commit, data and cursor cannot
    diverge — a crash leaves both pre-sync or both post-sync, and the
    replay applies the feed from exactly the state it diffs against.
    Concurrent sync steps are CAS-fenced for the same reason
    (``expect_seq``): a second replicator committing a stale plan
    would regress the cursor below the replica's actual state.

    The replica carries two extra columns: ``__src_seq`` (the source
    commit the row was synced at — the LWW recency) and ``__deleted``
    (the tombstone flag the merge consumed); readers project them away.

    Refusals, all loud:
    - a cursor pointing below the source's vacuum horizon (the diff
      base is gone — like a Kafka offset out of range): re-bootstrap
      into a fresh replica path; shrinking the sync interval below the
      source's vacuum grace prevents it.
    - source schema evolution since the last step surfaces as the
      replica merge's own schema-drift refusal: evolve the REPLICA the
      same way (plans.merge.evolve_schema), then re-run the step.
    - a fresh replica against an already-vacuumed source bootstraps
      from the full resolver read instead of the feed (the feed's
      from-0 base predates the horizon).
    - an existing target that does not carry a replication cursor in
      its commit metadata was not built by replicate_changes: refused
      (blindly syncing onto a foreign table corrupts it).

    Returns {"from_seq", "to_seq", "rows_applied", "bootstrap"};
    from_seq == to_seq means no new source commits (no-op, no merge).
    """
    jvm_path = spark._jvm.org.apache.hadoop.fs.Path
    fs = jvm_path(target_path).getFileSystem(spark._jsc.hadoopConfiguration())
    src = source_path.rstrip("/")
    tgt = target_path.rstrip("/")

    snaps = list_snapshots(spark, src)  # raises on a non-manifest source
    latest = snaps[-1]["seq"]
    dst_man = _read_manifest(spark, fs, jvm_path, tgt)
    cursor, dst_seq = None, None
    if dst_man is not None:
        dst_seq = dst_man[0]
        cursor = (dst_man[2].get(APP_META_KEY) or {}).get(REPL_META_KEY)
        if cursor is None:
            raise ValueError(
                f"replicate_changes: {tgt} is a merge target but carries "
                "no replication cursor in its commit metadata — it was "
                "not built by replicate_changes; sync into a fresh path"
            )
        if cursor.get("source") != src:
            raise ValueError(
                f"replicate_changes: the replica at {tgt} tracks source "
                f"{cursor.get('source')!r}, not {src!r} — one replica "
                "follows one source; use a fresh target path"
            )

    bootstrap = False
    if cursor is None:
        from_seq = 0
        oldest = snaps[0]["seq"]
        if oldest > 0:
            # vacuum already collected the early manifests: the feed
            # cannot diff from the empty init — bootstrap from the full
            # resolver read at the latest seq instead
            bootstrap = True
            from_seq = latest
    else:
        from_seq = int(cursor["last_seq"])
        if from_seq < snaps[0]["seq"]:
            raise ValueError(
                f"replicate_changes: the cursor's last_seq={from_seq} is "
                f"below the source's retained horizon (oldest manifest seq "
                f"{snaps[0]['seq']} at {src}) — the diff base was vacuumed; "
                "re-bootstrap into a fresh replica path, and sync more "
                "often than the source's vacuum grace"
            )

    if bootstrap:
        state = read_merged_table(spark, src, as_of_seq=latest)
        if state is None:
            batch = None  # empty source: nothing to bootstrap
        else:
            batch = (
                state.drop(BUCKET_COL)
                .withColumn(SRC_SEQ_COL, F.lit(latest).cast("bigint"))
                .withColumn(DELETED_COL, F.lit(False))
            )
    elif from_seq == latest:
        batch = None  # no new commits
    else:
        ch = read_changes(spark, src, from_seq=from_seq, to_seq=latest)
        batch = (
            ch.where(F.col(CHANGE_TYPE_COL) != "update_preimage")
            .withColumn(SRC_SEQ_COL, F.lit(latest).cast("bigint"))
            .withColumn(
                DELETED_COL, F.col(CHANGE_TYPE_COL) == F.lit("delete")
            )
            .drop(CHANGE_TYPE_COL)
        )

    rows_applied = 0
    if batch is not None:
        src_man = _read_manifest(spark, fs, jvm_path, src)
        first = dst_man is None
        res = merge_into(
            spark, tgt, batch,
            keys=list(src_man[2]["keys"]),
            order_cols=[SRC_SEQ_COL],
            is_delete=F.col(DELETED_COL),
            num_buckets=(
                (num_buckets or int(src_man[2]["num_buckets"]))
                if first else None
            ),
            protocol="manifest" if first else None,
            # the cursor rides the SAME manifest rename as the data
            # (see crash contract above); an all-netted-out feed still
            # advances it via the metadata-only commit path
            commit_meta={REPL_META_KEY: {"source": src, "last_seq": latest}},
            expect_seq=dst_seq,
        )
        rows_applied = res.get("touched_rows") or 0
    return {
        "from_seq": from_seq, "to_seq": latest,
        "rows_applied": int(rows_applied), "bootstrap": bootstrap,
    }


def replica_status(spark, source_path: str, target_path: str) -> dict:
    """Operational snapshot of a replica — the ``ivm_status`` twin for
    ``replicate_changes`` targets: ``last_seq`` (the committed cursor),
    ``lag_commits`` (source commits not yet synced), ``behind``, and
    ``at_risk`` (the cursor already fell below the source's vacuum
    horizon — the NEXT sync will refuse; sync more often than the
    source's vacuum grace).  Read-only: takes no lease, commits
    nothing."""
    src = source_path.rstrip("/")
    jvm_path = spark._jvm.org.apache.hadoop.fs.Path
    fs = jvm_path(target_path).getFileSystem(spark._jsc.hadoopConfiguration())
    man = _read_manifest(spark, fs, jvm_path, target_path.rstrip("/"))
    if man is None:
        raise ValueError(
            f"replica_status: {target_path} is not a manifest merge target"
        )
    cursor = (man[2].get(APP_META_KEY) or {}).get(REPL_META_KEY)
    if cursor is None:
        raise ValueError(
            f"replica_status: {target_path} carries no replication cursor "
            "in its commit metadata — not a replicate_changes target"
        )
    if cursor.get("source") != src:
        raise ValueError(
            f"replica_status: the replica at {target_path} tracks source "
            f"{cursor.get('source')!r}, not {src!r}"
        )
    snaps = list_snapshots(spark, src)
    last = int(cursor["last_seq"])
    return {
        "last_seq": last,
        "latest_src_seq": snaps[-1]["seq"],
        "lag_commits": snaps[-1]["seq"] - last,
        "behind": snaps[-1]["seq"] > last,
        "at_risk": last < snaps[0]["seq"],
    }


def vacuum_merged_table(
    spark,
    target_path: str,
    grace_sec: float = 3600.0,
    lease_stale_sec: float = LEASE_STALE_SEC,
) -> dict:
    """GC a manifest-commit target: delete generation directories not
    referenced by the LATEST manifest, superseded manifests, and .tmp
    manifest stragglers — each only once older than ``grace_sec``, which
    shields READERS that resolved the previous manifest and are still
    scanning its generations (size it above the longest expected read;
    readers take no lease).  Writers are excluded structurally: vacuum
    holds the writer lease for its duration, so it can never collect a
    concurrent merge's staged-but-uncommitted generations — without the
    lease, grace_sec=0 could delete a generation between its staging
    rename and its manifest commit.  Returns {"gens_deleted",
    "manifests_deleted"}.  Raises on a non-manifest target (the rename
    flavor self-cleans at swap time)."""
    import time as _time

    jvm_path = spark._jvm.org.apache.hadoop.fs.Path
    fs = jvm_path(target_path).getFileSystem(spark._jsc.hadoopConfiguration())
    tgt = target_path.rstrip("/")
    with _writer_lease(fs, jvm_path, tgt, lease_stale_sec):
        man = _read_manifest(spark, fs, jvm_path, tgt)
        if man is None:
            raise ValueError(
                f"vacuum_merged_table: {tgt} is not a manifest-commit target"
            )
        seq, latest_name, m = man
        live = {
            (f"{BUCKET_COL}={b}", f"{GEN_COL}={g}")
            for b, g in m["buckets"].items()
        }
        cutoff_ms = (_time.time() - grace_sec) * 1000.0
        gens_deleted = manifests_deleted = 0
        for st in fs.listStatus(jvm_path(tgt)):
            bname = st.getPath().getName()
            if not bname.startswith(BUCKET_COL + "="):
                continue
            for g in fs.listStatus(st.getPath()):
                gname = g.getPath().getName()
                if (bname, gname) in live or not gname.startswith(GEN_COL + "="):
                    continue  # live, or a foreign entry we refuse to touch
                if g.getModificationTime() <= cutoff_ms:
                    fs.delete(g.getPath(), True)
                    gens_deleted += 1
            # an empty bucket dir with no live generation left is clutter
            if bname.split("=", 1)[1] not in m["buckets"] and not list(
                fs.listStatus(st.getPath())
            ):
                fs.delete(st.getPath(), True)
        mdir = _manifest_dir(tgt)
        for st in fs.listStatus(jvm_path(mdir)):
            name = st.getPath().getName()
            head = name[: -len(".json")].split("-", 1)[0] if name.endswith(
                ".json"
            ) else ""
            stale_commit = (
                not name.startswith(".")
                and name != latest_name
                and head.isdigit()
                and int(head) < seq
            )
            stale_tmp = name.startswith(".tmp-")
            if (stale_commit or stale_tmp) and st.getModificationTime() <= cutoff_ms:
                fs.delete(st.getPath(), False)
                manifests_deleted += 1
        return {
            "gens_deleted": gens_deleted,
            "manifests_deleted": manifests_deleted,
        }


def maintain_merged_table(
    spark,
    target_path: str,
    target_bucket_bytes: int = 256 * 1024 * 1024,
    target_file_bytes: int = 128 * 1024 * 1024,
    grace_sec: float = 3600.0,
    lease_stale_sec: float = LEASE_STALE_SEC,
) -> dict:
    """ONE maintenance-window entry point for a manifest merge target
    (r13): run the detect→migrate rebucket composition
    (:func:`maybe_rebucket`), then within-generation compaction
    (:func:`compact_merged_table`), then GC
    (:func:`vacuum_merged_table`) — the order matters: a rebucket
    rewrites every generation (so compacting first would be wasted
    work), compaction stages what vacuum then trims the strands of.
    Each step takes the writer lease itself, so a concurrent merge
    refuses each phase individually rather than blocking for the whole
    window; when the layout fits and the files are sized, the whole
    call costs a few filesystem listings and no Spark job.  Returns
    ``{"rebucket": ..., "compact": ..., "vacuum": ...}`` (the three
    steps' own result dicts).  Rename-flavor targets get the rebucket
    advisor only (their per-swap rewrite self-compacts and self-GCs) —
    compact/vacuum report ``None`` there."""
    out: dict = {
        "rebucket": maybe_rebucket(
            spark, target_path, target_bucket_bytes,
            lease_stale_sec=lease_stale_sec,
        ),
        "compact": None,
        "vacuum": None,
    }
    # Probe the flavor EXPLICITLY rather than string-matching the
    # downstream refusal message (r13 ADVICE: a reworded error would
    # silently flip rename-flavor targets from skip to propagate).
    # Re-probe AFTER the rebucket step — a maybe_rebucket migration
    # preserves the flavor, but the probe is one manifest listing and
    # keeps this dispatch independent of that invariant.
    jvm_path = spark._jvm.org.apache.hadoop.fs.Path
    fs = jvm_path(target_path).getFileSystem(spark._jsc.hadoopConfiguration())
    if _read_manifest(spark, fs, jvm_path, target_path.rstrip("/")) is not None:
        out["compact"] = compact_merged_table(
            spark, target_path, target_file_bytes,
            lease_stale_sec=lease_stale_sec,
        )
        out["vacuum"] = vacuum_merged_table(
            spark, target_path, grace_sec, lease_stale_sec=lease_stale_sec
        )
    return out


def compact_merged_table(
    spark,
    target_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    lease_stale_sec: float = LEASE_STALE_SEC,
) -> dict:
    """Within-generation compaction for the MANIFEST flavor (r12
    verdict #4): a touched bucket's generation inherits the writing
    batch's parallelism — on a wide cluster a kilobyte-sized bucket can
    land as dozens of small part files, and the per-batch
    O(touched-bucket bytes) read cost gains a per-FILE constant (open +
    footer) that eventually dominates.  This op rewrites every live
    generation whose data-file count exceeds
    ``max(1, ceil(bytes / target_file_bytes))`` down to that count
    (``coalesce`` — a file merge, no shuffle) as a fresh generation,
    then flips ALL compacted buckets in ONE manifest commit — the same
    atomic crash contract as a merge: pre-compaction until the rename
    lands, post- after; a crash strands only unreferenced generations
    (vacuum fodder).  State is byte-unchanged by construction (read →
    coalesce → write, no projection).  Holds the writer lease, so a
    concurrent merge and a compaction refuse each other.

    One small Spark job per fat bucket (bounded by the touched set —
    this is a maintenance-window op like vacuum/rebucket; run it on the
    same cadence).  Other flavors: the rename-bucketed layout rewrites
    each touched bucket wholesale at every swap, so its file count
    tracks the LAST batch's parallelism (compact by ``rebucket`` to the
    same count if needed); the plain flavor rewrites the whole table
    per merge and self-compacts.  Raises on both (nothing
    generation-shaped to compact).

    Returns ``{"engine", "seq", "compacted_buckets", "files_before",
    "files_after"}`` (seq unchanged and empty list when every
    generation already fits)."""
    import math

    jvm_path = spark._jvm.org.apache.hadoop.fs.Path
    fs = jvm_path(target_path).getFileSystem(spark._jsc.hadoopConfiguration())
    tgt = target_path.rstrip("/")
    tmp = tgt + ".__tmp"
    prefix = BUCKET_COL + "="
    with _writer_lease(fs, jvm_path, tgt, lease_stale_sec):
        man = _read_manifest(spark, fs, jvm_path, tgt)
        if man is None:
            raise ValueError(
                f"compact_merged_table: {tgt} is not a manifest-commit "
                "target — the rename flavor rewrites touched buckets "
                "wholesale at every swap (rebucket to the same count to "
                "compact), the plain flavor self-compacts per merge"
            )
        seq, _, m = man
        live = dict(m["buckets"])
        todo = []  # (bucket, gen_dir_path, n_target, n_files)
        files_before = files_after = 0
        for b, g in sorted(live.items(), key=lambda kv: int(kv[0])):
            gdir = f"{tgt}/{prefix}{b}/{GEN_COL}={g}"
            sizes = [
                st.getLen()
                for st in fs.listStatus(jvm_path(gdir))
                if not st.getPath().getName().startswith(("_", "."))
            ]
            n_target = max(1, math.ceil(sum(sizes) / float(target_file_bytes)))
            files_before += len(sizes)
            if len(sizes) > n_target:
                todo.append((b, gdir, n_target))
            else:
                files_after += len(sizes)
        if not todo:
            return {
                "engine": "parquet-manifest", "seq": seq,
                "compacted_buckets": [], "files_before": files_before,
                "files_after": files_before,
            }
        gen = _new_gen()
        new_live = dict(live)
        for b, gdir, n_target in todo:
            # a direct leaf read (no basePath) yields data columns only
            # — no partition-column inference, so the rewrite is
            # byte-faithful to the generation's own schema
            fs.delete(jvm_path(tmp), True)
            spark.read.parquet(gdir).coalesce(n_target).write.mode(
                "overwrite"
            ).parquet(tmp)
            dest = jvm_path(f"{tgt}/{prefix}{b}/{GEN_COL}={gen}")
            if not fs.rename(jvm_path(tmp), dest):
                raise IOError(
                    f"compact_merged_table: could not stage {tgt}/{prefix}{b}"
                )
            new_live[str(b)] = gen
            files_after += sum(
                1
                for st in fs.listStatus(dest)
                if not st.getPath().getName().startswith(("_", "."))
            )
        _commit_manifest(
            fs, jvm_path, tgt, seq + 1, gen,
            {
                "num_buckets": int(m["num_buckets"]), "keys": list(m["keys"]),
                "key_types": dict(m["key_types"]),
                **({"columns": m["columns"]} if "columns" in m else {}),
                **_carry_app_meta(m),
                "buckets": new_live, "seq": seq + 1, "gen": gen,
            },
        )
        fs.delete(jvm_path(tmp), True)
        return {
            "engine": "parquet-manifest", "seq": seq + 1,
            "compacted_buckets": [b for b, _, _ in todo],
            "files_before": files_before, "files_after": files_after,
        }


def rebucket(
    spark,
    target_path: str,
    new_num_buckets: int,
    lease_stale_sec: float = LEASE_STALE_SEC,
) -> dict:
    """Re-layout a bucketed merge_into target to a NEW bucket count
    (r11 verdict #3): a table laid out at N buckets that grows 100x
    keeps N ever-fatter buckets, eroding the O(touched/N) per-batch
    advantage — this is the migration path.  One deliberate full-cost
    pass: read all live state, re-hash every key into the new bucket
    space, and install it under the target's OWN commit protocol (the
    whole-dir rename swap for the rename flavor, a fresh all-bucket
    generation + one manifest commit for the manifest flavor).  Holds
    the writer lease for the duration, so a mid-flight merge and a
    rebucket refuse each other.  Merged STATE is unchanged by
    construction (pinned by tests and the gate query); only the layout
    and the pinned num_buckets move.  Old manifest generations become
    vacuum fodder; the rename flavor self-cleans at swap."""
    from pyspark.sql import Observation
    from pyspark.sql.utils import AnalysisException

    if new_num_buckets < 1:
        raise ValueError(
            f"rebucket: new_num_buckets must be >= 1, got {new_num_buckets}"
        )
    jvm_path = spark._jvm.org.apache.hadoop.fs.Path
    fs = jvm_path(target_path).getFileSystem(spark._jsc.hadoopConfiguration())
    tgt = target_path.rstrip("/")
    tmp = tgt + ".__tmp"
    old = tgt + ".__old"
    prefix = BUCKET_COL + "="
    with _writer_lease(fs, jvm_path, tgt, lease_stale_sec):
        man = _read_manifest(spark, fs, jvm_path, tgt)
        if man is not None:
            seq, _, m = man
            keys, key_types = list(m["keys"]), dict(m["key_types"])
            gen = _new_gen()
            if not m["buckets"]:  # empty table: the layout move is pure metadata
                # carry the schema pin (r14: the read_changes lifecycle
                # property caught this path DROPPING it — losing the pin
                # silently disarms _check_schema_pin for every later
                # batch and un-types empty reads)
                _commit_manifest(
                    fs, jvm_path, tgt, seq + 1, gen,
                    {"num_buckets": int(new_num_buckets), "keys": keys,
                     "key_types": key_types,
                     **({"columns": m["columns"]} if "columns" in m else {}),
                     **_carry_app_meta(m),
                     "buckets": {}, "seq": seq + 1,
                     "gen": gen},
                )
                return {"engine": "parquet-manifest", "rows": 0,
                        "num_buckets": new_num_buckets, "seq": seq + 1}
            paths = [
                f"{tgt}/{prefix}{b}/{GEN_COL}={g}"
                for b, g in sorted(m["buckets"].items(), key=lambda kv: int(kv[0]))
            ]
            cur = (
                _pinned_read(spark, paths, m.get("columns"), base_path=tgt)
                .drop(GEN_COL).drop(BUCKET_COL)
            )
            rehashed = cur.withColumn(BUCKET_COL, bucket_expr(keys, new_num_buckets))
            obs = Observation()
            rehashed = rehashed.observe(obs, F.count(F.lit(1)).alias("n"))
            fs.delete(jvm_path(tmp), True)
            rehashed.write.mode("overwrite").partitionBy(BUCKET_COL).parquet(tmp)
            new_live = {}
            for st in fs.listStatus(jvm_path(tmp)):
                name = st.getPath().getName()
                if not name.startswith(prefix):
                    continue
                fs.mkdirs(jvm_path(tgt + "/" + name))
                dest = jvm_path(tgt + "/" + name + "/" + f"{GEN_COL}={gen}")
                if not fs.rename(st.getPath(), dest):
                    raise IOError(f"rebucket: could not stage {tgt}/{name}")
                new_live[name.split("=", 1)[1]] = gen
            _commit_manifest(
                fs, jvm_path, tgt, seq + 1, gen,
                {"num_buckets": int(new_num_buckets), "keys": keys,
                 "key_types": key_types,
                 **({"columns": m["columns"]} if "columns" in m else {}),
                 **_carry_app_meta(m),
                 "buckets": new_live, "seq": seq + 1,
                 "gen": gen},
            )
            fs.delete(jvm_path(tmp), True)
            return {"engine": "parquet-manifest", "rows": obs.get["n"],
                    "num_buckets": new_num_buckets, "seq": seq + 1}

        _recover_whole_dir(fs, jvm_path, tgt)
        spec = _read_bucket_spec(spark, fs, jvm_path, tgt)
        if spec is None:
            raise ValueError(
                f"rebucket: {tgt} has no bucketed layout — lay one out first "
                "via merge_into(num_buckets=...)"
            )
        _, keys, key_types, spec_cols = spec
        # finish any crashed merge's per-bucket swap first: pending
        # asides would read as missing buckets in the full scan below
        _recover_buckets(fs, jvm_path, tgt)
        try:
            cur = spark.read.option("mergeSchema", "true").parquet(tgt)
        except AnalysisException as e:
            if not _is_empty_read(e):
                raise
            # spec'd but zero data files (all keys deleted): the layout
            # move is pure metadata — rewrite the spec in place
            _write_bucket_spec(
                fs, jvm_path, tgt, keys, new_num_buckets, key_types,
                columns=spec_cols,
            )
            return {"engine": "parquet-swap", "rows": 0,
                    "num_buckets": new_num_buckets}
        rehashed = _conform_to_pin(cur, spec_cols).drop(BUCKET_COL).withColumn(
            BUCKET_COL, bucket_expr(keys, new_num_buckets)
        )
        obs = Observation()
        rehashed = rehashed.observe(obs, F.count(F.lit(1)).alias("n"))
        fs.delete(jvm_path(tmp), True)
        rehashed.write.mode("overwrite").partitionBy(BUCKET_COL).parquet(tmp)
        _write_bucket_spec(
            fs, jvm_path, tmp, keys, new_num_buckets, key_types,
            columns=spec_cols,
        )
        _swap_whole_dir(fs, jvm_path, tgt, tmp, old)
        return {"engine": "parquet-swap", "rows": obs.get["n"],
                "num_buckets": new_num_buckets}


_INT_DIGITS = {"tinyint": 3, "smallint": 5, "int": 10, "bigint": 19}
_INT_ORDER = ["tinyint", "smallint", "int", "bigint"]


def _is_widening(src: str, dst: str) -> bool:
    """True when every value of Spark dtype ``src`` is exactly
    representable in dtype ``dst`` (the only type changes evolve_schema
    permits).  Deliberately conservative: bigint→double is REFUSED
    (doubles hold 53 mantissa bits, longs 63 — values above 2^53
    silently round), as is float→decimal (binary fractions have no
    exact decimal form at fixed scale)."""
    import re

    if src in _INT_ORDER and dst in _INT_ORDER:
        return _INT_ORDER.index(dst) > _INT_ORDER.index(src)
    if dst == "double" and src in ("float", "tinyint", "smallint", "int"):
        return True  # 53-bit mantissa holds every float/int32 exactly
    d_src = re.fullmatch(r"decimal\((\d+),(\d+)\)", src)
    d_dst = re.fullmatch(r"decimal\((\d+),(\d+)\)", dst)
    if d_dst:
        p2, s2 = int(d_dst.group(1)), int(d_dst.group(2))
        if d_src:
            p1, s1 = int(d_src.group(1)), int(d_src.group(2))
            return s2 >= s1 and p2 - s2 >= p1 - s1 and (p1, s1) != (p2, s2)
        if src in _INT_DIGITS:
            return p2 - s2 >= _INT_DIGITS[src]
    return False


def _quote_ident(ident: str) -> str:
    """Backtick-quote a SQL identifier (or a delta.`path`) with embedded
    backticks doubled — the one escape Spark SQL honors inside backtick
    quoting.  Without it a column or path containing a backtick would
    break out of the ALTER TABLE statement the Delta delegation
    assembles (r13 ADVICE)."""
    return "`" + ident.replace("`", "``") + "`"


def _validate_evolution(target_path, pinned, keys, add, widen) -> None:
    """Shared refusal set for evolve_schema: only additive NULL-backed
    columns and provably-lossless type widenings pass; everything else
    (narrowing, renames, drops, key-type changes) is a rebuild."""
    dup = sorted(set(add) & set(pinned))
    if dup:
        raise ValueError(
            f"evolve_schema: add columns {dup} already exist at "
            f"{target_path} — renames are not supported (a rename is a "
            "drop + add, and drops destroy data); rebuild into a new target"
        )
    bad = {BUCKET_COL, GEN_COL, "__del", "__tgt_pri", "__rk"} & set(add)
    if bad:
        raise ValueError(
            f"evolve_schema: add names {sorted(bad)} collide with reserved "
            "merge-protocol columns"
        )
    missing = sorted(set(widen) - set(pinned))
    if missing:
        raise ValueError(
            f"evolve_schema: widen columns {missing} do not exist at "
            f"{target_path} (stored columns: {sorted(pinned)})"
        )
    if keys:
        key_w = sorted(set(widen) & set(keys))
        if key_w:
            raise ValueError(
                f"evolve_schema: cannot widen key columns {key_w} — "
                "xxhash64 hashes the TYPED value, so a key-type change "
                "re-routes every existing key into a different bucket "
                "space; rebuild the table under the new key types"
            )
    for c, new_t in widen.items():
        old_t = pinned[c]
        if new_t == old_t:
            raise ValueError(
                f"evolve_schema: column {c!r} is already {old_t} at "
                f"{target_path}"
            )
        if not _is_widening(old_t, new_t):
            raise ValueError(
                f"evolve_schema: {c!r} {old_t} -> {new_t} is not a "
                "lossless widening (narrowing and lossy casts are "
                "refused — rebuild into a new target if you really mean "
                f"it); permitted: int-ladder up-casts, float->double, "
                "int->double (int32 and below), decimal scale/precision "
                "growth, int->decimal with enough integer digits"
            )


def _evolved_pin(pinned: dict, add: dict, widen: dict) -> dict:
    """New schema pin: widened types replace in place (column order is
    part of the pin), added columns append in the caller's order."""
    return {**{c: widen.get(c, t) for c, t in pinned.items()}, **add}


def _evolve_transform(cur, pinned: dict, add: dict, widen: dict):
    """The rewrite-pass projection: widen casts in pin order, adds as
    typed NULLs, the __bucket partition column (when present) rides
    last unchanged."""
    cols = [
        F.col(c).cast(widen[c]).alias(c) if c in widen else F.col(c)
        for c in pinned
    ]
    cols += [F.lit(None).cast(t).alias(c) for c, t in add.items()]
    extras = [F.col(c) for c in cur.columns if c not in pinned and c not in add]
    return cur.select(*cols, *extras)


def evolve_schema(
    spark,
    target_path: str,
    add: dict | None = None,
    widen: dict | None = None,
    rename: dict | None = None,
    lease_stale_sec: float = LEASE_STALE_SEC,
) -> dict:
    """Explicit schema evolution for a merge_into target (r12 verdict
    #1 — the operation the schema-pin drift refusal points at).  Two
    primitives, the only two that are always safe:

    - ``add={col: dtype}`` — append NULL-backed columns.  On the
      MANIFEST flavor this is METADATA-ONLY: one manifest commit
      updates the pinned ``columns``; no data file is touched, and
      every reader/merger conforms older generations to the pin
      (missing column -> typed NULL) via ``_conform_to_pin``.  On the
      RENAME-BUCKETED flavor it is a single in-place ``_bucket_spec``
      rewrite (one small file; a crash mid-write leaves a CORRUPT spec
      that every later call refuses loudly — weaker than the manifest
      commit but never silent).  On the PLAIN flavor there is no pin
      file, so the add is a full rewrite under the whole-dir swap.
    - ``widen={col: dtype}`` — lossless type widening (see
      :func:`_is_widening`; on the BUCKETED flavors key columns are
      refused — xxhash64 is type-sensitive and a key-type change would
      re-route every bucket.  The PLAIN flavor stores no key list and
      has no hash routing, so key widening is permitted there: the
      merge keys are whatever the caller passes per-merge, and a
      widened key still equi-joins losslessly.  This asymmetry is
      deliberate — documented here rather than refused, because the
      plain layout cannot know which columns are keys).
      Always a full-cost rewrite pass under the layout's own commit
      protocol (rebucket-style): fresh all-bucket generation + one
      manifest commit, or tmp-write + whole-dir swap.  A crash at any
      point leaves the table readable as exactly pre- or post-evolve
      (manifest), or recoverable via the standard aside protocol
      (rename/plain).

    Narrowing, renames, and drops are refused — they destroy data;
    rebuild into a new target if that is really the intent.

    CONTRACT AFTER AN ADD: the pin is exact-schema, so every subsequent
    batch must CARRY the added column (NULL-valued where absent).
    Accepting pin-subset batches instead would blunt drift detection —
    a batch that accidentally dropped a column would silently merge
    NULLs over stored data.

    Holds the writer lease for the duration (a concurrent merge and an
    evolution refuse each other).  Delta targets: ``add`` delegates to
    ``ALTER TABLE ... ADD COLUMNS`` (same NULL-backfill semantics);
    ``widen`` is refused with a pointer at Delta's own type-widening
    table feature, which this sandbox cannot exercise.

    Returns ``{"engine", "added", "widened", "rewritten", ...}`` with
    ``seq`` on manifest targets and ``rows`` when a rewrite ran.

    Reference semantics anchor: the reference validates ENVELOPE
    shapes at runtime (``src/lens/broker.clj:28-51``) and delegates
    entity-schema change to its store — exactly the operation this op
    supplies for the portable store flavors.
    """
    from pyspark.sql import Observation
    from pyspark.sql.utils import AnalysisException

    if rename:
        # refused WITH the migration recipe (r13 NOTES candidate #4):
        # a rename is a drop + add, and drops destroy data — but the
        # lossless equivalent is expressible with the two supported
        # primitives plus one LWW pass, so spell it out
        recipe = "; ".join(
            f"evolve_schema(add={{{new!r}: <dtype of {old!r}>}}), then one "
            f"merge_into pass carrying {new!r} = {old!r} for every stored "
            f"key (a backfill copy), then rebuild into a new target "
            f"without {old!r} when the old column must actually go"
            for old, new in dict(rename).items()
        )
        raise ValueError(
            "evolve_schema: rename is not supported — it is a drop + add "
            "and drops destroy data.  Lossless recipe per column: " + recipe
        )
    add = dict(add or {})
    widen = dict(widen or {})
    if not add and not widen:
        raise ValueError("evolve_schema: pass at least one of add=, widen=")
    both = sorted(set(add) & set(widen))
    if both:
        raise ValueError(
            f"evolve_schema: columns {both} appear in both add and widen"
        )
    # Validate + CANONICALIZE every dtype string up front (r13
    # self-review): the metadata-only paths pin the string verbatim
    # without ever constructing the type, so a typo'd dtype would pin
    # silently, refuse every later batch as drifted, and crash only at
    # the conform-read's cast; a case-variant ('String',
    # 'DECIMAL(12,2)') would poison the pin's string-equality checks.
    # simpleString() is exactly the form DataFrame.dtypes emits, so the
    # canonical pin compares clean against batch dtypes.
    from pyspark.sql.types import _parse_datatype_string

    for which in (add, widen):
        for c, t in list(which.items()):
            try:
                which[c] = _parse_datatype_string(t).simpleString()
            except Exception as e:
                raise ValueError(
                    f"evolve_schema: invalid Spark dtype {t!r} for column "
                    f"{c!r} ({type(e).__name__}) — use DataFrame.dtypes "
                    "spellings, e.g. 'string', 'bigint', 'decimal(12,2)'"
                ) from e

    try:
        from delta.tables import DeltaTable  # type: ignore

        is_delta = DeltaTable.isDeltaTable(spark, target_path)
    except Exception:
        is_delta = False
    if is_delta:
        if widen:
            raise ValueError(
                "evolve_schema: type widening on a Delta target is Delta's "
                "own typeWidening table feature (ALTER TABLE ... ALTER "
                "COLUMN ... TYPE) — use it directly; this op only manages "
                "the portable layouts' pins"
            )
        # Same refusal set as the portable flavors BEFORE delegating
        # (r13 ADVICE): Delta refuses duplicate adds itself, but the
        # reserved merge-protocol names (__bucket, __del, ...) would
        # pass straight through and poison every later merge_into.
        _validate_evolution(
            target_path,
            dict(spark.read.format("delta").load(target_path).dtypes),
            None, add, {},
        )
        cols = ", ".join(f"{_quote_ident(c)} {t}" for c, t in add.items())
        spark.sql(
            f"ALTER TABLE delta.{_quote_ident(target_path)} "
            f"ADD COLUMNS ({cols})"
        )
        return {
            "engine": "delta", "added": sorted(add), "widened": {},
            "rewritten": False,
        }

    jvm_path = spark._jvm.org.apache.hadoop.fs.Path
    fs = jvm_path(target_path).getFileSystem(spark._jsc.hadoopConfiguration())
    tgt = target_path.rstrip("/")
    tmp = tgt + ".__tmp"
    old = tgt + ".__old"
    prefix = BUCKET_COL + "="
    with _writer_lease(fs, jvm_path, tgt, lease_stale_sec):
        man = _read_manifest(spark, fs, jvm_path, tgt)
        if man is not None:
            man_seq, _, m = man
            keys = list(m["keys"])
            n_buckets = int(m["num_buckets"])
            live = dict(m["buckets"])
            pinned = m.get("columns")
            if pinned is None:
                # pre-pin layout: derive the pin from the live union
                # schema so evolution also UPGRADES the table to pinned
                if not live:
                    raise ValueError(
                        f"evolve_schema: {tgt} predates the schema pin and "
                        "is empty — nothing to derive a schema from; "
                        "rebuild the table"
                    )
                paths = [
                    f"{tgt}/{prefix}{b}/{GEN_COL}={g}" for b, g in live.items()
                ]
                derived = (
                    spark.read.option("basePath", tgt)
                    .option("mergeSchema", "true").parquet(*paths)
                    .drop(GEN_COL).drop(BUCKET_COL)
                )
                pinned = dict(derived.dtypes)
            _validate_evolution(tgt, pinned, keys, add, widen)
            new_pin = _evolved_pin(pinned, add, widen)
            gen = _new_gen()
            base = {
                "num_buckets": n_buckets, "keys": keys,
                "key_types": dict(m["key_types"]), "columns": new_pin,
                **_carry_app_meta(m),
            }
            if not widen or not live:
                # metadata-only: ONE atomic manifest commit (live
                # generations untouched; readers conform to the pin)
                _commit_manifest(
                    fs, jvm_path, tgt, man_seq + 1, gen,
                    {**base, "buckets": live, "seq": man_seq + 1, "gen": gen},
                )
                return {
                    "engine": "parquet-manifest", "added": sorted(add),
                    "widened": dict(widen), "rewritten": False,
                    "seq": man_seq + 1,
                }
            # widen: full rewrite — fresh generation for every live
            # bucket, then one commit (rebucket's protocol, same N)
            paths = [
                f"{tgt}/{prefix}{b}/{GEN_COL}={g}"
                for b, g in sorted(live.items(), key=lambda kv: int(kv[0]))
            ]
            cur = _pinned_read(spark, paths, pinned, base_path=tgt).drop(
                GEN_COL
            )
            out = _evolve_transform(cur, pinned, add, widen)
            obs = Observation()
            out = out.observe(obs, F.count(F.lit(1)).alias("n"))
            fs.delete(jvm_path(tmp), True)
            out.write.mode("overwrite").partitionBy(BUCKET_COL).parquet(tmp)
            new_live = {}
            for st in fs.listStatus(jvm_path(tmp)):
                name = st.getPath().getName()
                if not name.startswith(prefix):
                    continue
                fs.mkdirs(jvm_path(tgt + "/" + name))
                dest = jvm_path(tgt + "/" + name + "/" + f"{GEN_COL}={gen}")
                if not fs.rename(st.getPath(), dest):
                    raise IOError(f"evolve_schema: could not stage {tgt}/{name}")
                new_live[name.split("=", 1)[1]] = gen
            _commit_manifest(
                fs, jvm_path, tgt, man_seq + 1, gen,
                {**base, "buckets": new_live, "seq": man_seq + 1, "gen": gen},
            )
            fs.delete(jvm_path(tmp), True)
            return {
                "engine": "parquet-manifest", "added": sorted(add),
                "widened": dict(widen), "rewritten": True,
                "rows": obs.get["n"], "seq": man_seq + 1,
            }

        _recover_whole_dir(fs, jvm_path, tgt)
        spec = _read_bucket_spec(spark, fs, jvm_path, tgt)
        if spec is not None:
            spec_n, keys, key_types, spec_cols = spec
            _recover_buckets(fs, jvm_path, tgt)
            pinned = spec_cols
            cur = None
            try:
                cur = spark.read.option("mergeSchema", "true").parquet(tgt)
            except AnalysisException as e:
                if not _is_empty_read(e):
                    raise  # spec'd but zero data files is the only pass
            if pinned is None:
                if cur is None:
                    raise ValueError(
                        f"evolve_schema: {tgt} predates the schema pin and "
                        "is empty — nothing to derive a schema from; "
                        "rebuild the table"
                    )
                pinned = {
                    c: t for c, t in cur.dtypes if c != BUCKET_COL
                }
            _validate_evolution(tgt, pinned, keys, add, widen)
            new_pin = _evolved_pin(pinned, add, widen)
            if not widen or cur is None:
                # metadata-only add: in-place spec rewrite — one small
                # file; a crash mid-write leaves a corrupt spec every
                # later call refuses LOUDLY (weaker than the manifest
                # flavor's atomic commit, never silent)
                _write_bucket_spec(
                    fs, jvm_path, tgt, keys, spec_n, key_types,
                    columns=new_pin,
                )
                return {
                    "engine": "parquet-swap", "added": sorted(add),
                    "widened": dict(widen), "rewritten": False,
                }
            out = _evolve_transform(_conform_to_pin(cur, pinned), pinned, add, widen)
            obs = Observation()
            out = out.observe(obs, F.count(F.lit(1)).alias("n"))
            fs.delete(jvm_path(tmp), True)
            out.write.mode("overwrite").partitionBy(BUCKET_COL).parquet(tmp)
            _write_bucket_spec(
                fs, jvm_path, tmp, keys, spec_n, key_types, columns=new_pin
            )
            _swap_whole_dir(fs, jvm_path, tgt, tmp, old)
            return {
                "engine": "parquet-swap", "added": sorted(add),
                "widened": dict(widen), "rewritten": True,
                "rows": obs.get["n"],
            }

        # plain flavor: the live table schema is the pin; both add and
        # widen are full rewrites under the whole-dir swap (parquet
        # without a pin file cannot express a metadata-only change
        # deterministically — mixed-schema files would read
        # listing-order-dependently)
        try:
            cur = spark.read.parquet(tgt)
        except AnalysisException as e:
            if not _is_empty_read(e):
                raise
            raise ValueError(
                f"evolve_schema: no table at {tgt} — the first merge "
                "materializes the schema; evolution applies to existing "
                "targets"
            )
        pinned = dict(cur.dtypes)
        _validate_evolution(tgt, pinned, None, add, widen)
        out = _evolve_transform(cur, pinned, add, widen)
        obs = Observation()
        out = out.observe(obs, F.count(F.lit(1)).alias("n"))
        fs.delete(jvm_path(tmp), True)
        out.write.mode("overwrite").parquet(tmp)
        _swap_whole_dir(fs, jvm_path, tgt, tmp, old)
        return {
            "engine": "parquet-swap", "added": sorted(add),
            "widened": dict(widen), "rewritten": True, "rows": obs.get["n"],
        }


def suggest_num_buckets(
    spark,
    target_path: str,
    target_bucket_bytes: int = 256 * 1024 * 1024,
) -> dict:
    """Rebucket advisor (r12, completing the migration story): report
    whether a bucketed target's layout still fits its size.  The
    O(touched/N) per-batch advantage decays as buckets fatten — a table
    laid out at N=16 that grew 100x rewrites ~6% of a now-huge table
    per touched bucket.  Pure filesystem stats (no Spark job): sums the
    LIVE data bytes (manifest-resolved generations, or the bucket dirs
    for the rename flavor), divides by ``target_bucket_bytes`` (default
    256 MB — a few parquet row groups; size to taste), rounds to the
    nearest power of two, and recommends a rebucket only past 2x
    hysteresis in either direction (re-layouts are full-cost; don't
    thrash).  Returns {"num_buckets", "live_bytes", "suggested",
    "rebucket_recommended"}; raises on an unbucketed target.

    Scheduling the migration stays with the caller (run
    :func:`rebucket` in a maintenance window — it takes the writer
    lease, so in-flight merges and the migration refuse each other).
    """
    jvm_path = spark._jvm.org.apache.hadoop.fs.Path
    fs = jvm_path(target_path).getFileSystem(spark._jsc.hadoopConfiguration())
    tgt = target_path.rstrip("/")
    prefix = BUCKET_COL + "="

    def _du(path) -> int:
        total = 0
        stack = [path]
        while stack:
            for st in fs.listStatus(stack.pop()):
                if st.isDirectory():
                    stack.append(st.getPath())
                else:
                    total += st.getLen()
        return total

    man = _read_manifest(spark, fs, jvm_path, tgt)
    if man is not None:
        _, _, m = man
        cur_n = int(m["num_buckets"])
        live = sum(
            _du(jvm_path(f"{tgt}/{prefix}{b}/{GEN_COL}={g}"))
            for b, g in m["buckets"].items()
            if fs.exists(jvm_path(f"{tgt}/{prefix}{b}/{GEN_COL}={g}"))
        )
    else:
        spec = _read_bucket_spec(spark, fs, jvm_path, tgt)
        if spec is None:
            raise ValueError(
                f"suggest_num_buckets: {tgt} has no bucketed layout"
            )
        cur_n = spec[0]
        live = sum(
            _du(st.getPath())
            for st in fs.listStatus(jvm_path(tgt))
            if st.getPath().getName().startswith(prefix)
        )
    raw = max(1.0, live / float(target_bucket_bytes))
    suggested = 1 << max(0, round(__import__("math").log2(raw)))
    return {
        "num_buckets": cur_n,
        "live_bytes": live,
        "suggested": suggested,
        "rebucket_recommended": suggested >= 2 * cur_n or 2 * suggested <= cur_n,
    }


def maybe_rebucket(
    spark,
    target_path: str,
    target_bucket_bytes: int = 256 * 1024 * 1024,
    lease_stale_sec: float = LEASE_STALE_SEC,
) -> dict:
    """The detect→migrate composition (r12): run the advisor and, ONLY
    if it recommends (2x hysteresis in either direction), execute the
    :func:`rebucket` migration to the suggested power-of-two count.
    Idempotent maintenance entry point — call it from the same window
    that runs :func:`vacuum_merged_table`; when the layout still fits
    it costs two filesystem listings and no Spark job.  Returns the
    advisor dict plus ``{"rebucketed": bool}`` (and the migration's
    metrics under ``"migration"`` when one ran).  The migration takes
    the writer lease, so a concurrent merge and this refuse each other
    rather than interleave."""
    advice = suggest_num_buckets(spark, target_path, target_bucket_bytes)
    if not advice["rebucket_recommended"]:
        return {**advice, "rebucketed": False}
    migration = rebucket(
        spark, target_path, advice["suggested"], lease_stale_sec=lease_stale_sec
    )
    return {**advice, "rebucketed": True, "migration": migration}
