"""tx-type resolution + command generation (reference A10-A15, A17-A19).

The reference walks the tree node-at-a-time, dispatching each node on
``coalesce(node.tx_type, parent_tx, 'insert')``
(``import_clinical_data.clj:92-100``) and emitting one command per node
(constructors at ``:24-69``).  Here each hierarchy *level* is one
DataFrame pass:

- tx resolution   = a parent-child equi-join on the OID path + coalesce
- remove pruning  = filter ``parent_rtx != 'remove'`` (remove does NOT
                    cascade — proven by reference test ``:208-220``)
- command rows    = per-verb projections unioned by name
- identity        = deterministic uuid chain (A17) + command-id hashing
                    over ``{name} ++ sorted(params ∪ {file-oid})`` (A18;
                    file-oid is hashed too because ``assoc-file-oid``
                    wraps send-command *before* ``command`` builds the id,
                    ``import_clinical_data.clj:271-273,291-297``).

Upsert exists at every level here (strict superset of the reference,
which only has it for subject/study-event — quirk Q2 in SURVEY.md §7.4).

Output is one flat commands DataFrame (columns below) — flat rather than
a params struct so the DuckDB oracle can hash-compare it directly.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.keys import NIL_UUID, guard_payload, uuid3_str_col, uuid5_col
from ..session import local_ckpt
from .odm import OdmTables


# sentinel for generate_commands(batch_cmd_id=...): derive the batch
# namespace per row from file_oid, using the SAME flavor as the command
# hashing (passing per_file_batch_cmd_id() directly risks silently
# mixing an md5 namespace with sha1 cmd hashing)
PER_FILE = "per-file"


def batch_cmd_id_map(meta: dict[str, str]) -> Column:
    """Per-row batch-cmd-id looked up from a small ``{file_oid:
    batch_cmd_id}`` mapping — the reference's batch-command QUEUE
    metadata (each queued batch command carries its externally-assigned
    id, ``broker.clj:157-169``).  Lets ONE ``generate_commands`` pass
    process a multi-file micro-batch without a per-file driver loop
    (the collect-and-loop shape that doesn't scale); the map is a
    literal expression, broadcast-sized by nature (one entry per
    in-flight batch command).

    A ``file_oid`` absent from the map FAILS THE JOB (raise_error), not
    silently NULLs: ``element_at`` returns NULL for a missing key, that
    NULL would flow into every cmd_id of the whole file, and nothing
    downstream consumes NULL ids — a stale queue-metadata map would
    lose the file's commands without a trace (ADVICE r4)."""
    pairs: list[Column] = []
    for k in sorted(meta):
        pairs.append(F.lit(k))
        pairs.append(F.lit(meta[k]))
    return F.coalesce(
        F.element_at(F.create_map(*pairs), F.col("file_oid")),
        F.raise_error(
            F.concat(
                F.lit("batch_cmd_id_map: file_oid not in queue metadata map: "),
                F.coalesce(F.col("file_oid"), F.lit("<NULL>")),
            )
        ),
    )


def per_file_batch_cmd_id(flavor: str = "md5") -> Column:
    """Per-row batch-cmd-id derived from ``file_oid`` — the multi-file
    batch entry point.  The reference consumes a *queue* of batch
    commands, one per ODM file, and namespaces every generated cmd id
    under its own batch command's id (``broker.clj:157-169``,
    ``import_clinical_data.clj:288-297``: ``gen-cmd-id`` hashes into the
    batch-cmd-id namespace).  Prefer
    ``generate_commands(batch_cmd_id=PER_FILE, flavor=...)``, which
    calls this with the command-hash flavor so the namespace and cmd-id
    flavors can't diverge: N files in one DataFrame run, each file's
    commands namespaced under its own deterministic batch id — a pure
    projection, no join, so the multi-file path costs nothing extra at
    scale."""
    return _keyfn(flavor)(NIL_UUID, [F.lit("batch-cmd"), F.col("file_oid")])

COMMAND_COLUMNS = (
    "cmd_id",
    "name",
    "sub",
    "file_oid",
    "study_oid",
    "subject_key",
    "study_event_oid",
    "form_oid",
    "item_group_oid",
    "item_oid",
    "data_type",
    "value_canon",
    "parent_id",
    "item_id",
)

_PATH = {
    "subjects": ["file_oid", "study_oid", "subject_key"],
    "study_events": ["file_oid", "study_oid", "subject_key", "study_event_oid"],
    "forms": ["file_oid", "study_oid", "subject_key", "study_event_oid", "form_oid"],
    "item_groups": [
        "file_oid", "study_oid", "subject_key", "study_event_oid", "form_oid", "item_group_oid",
    ],
}


def resolve_tx(odm: OdmTables) -> OdmTables:
    """Add ``rtx`` (resolved tx-type) per level; prune descendants of
    removed/ nodes (they are never visited — A14)."""
    subjects = odm.subjects.withColumn("rtx", F.coalesce(F.col("tx_type"), F.lit("insert")))

    def child_resolve(child: DataFrame, parent: DataFrame, keys: list[str]) -> DataFrame:
        p = parent.where(F.col("rtx") != "remove").select(*keys, F.col("rtx").alias("parent_rtx"))
        return (
            child.join(p, keys, "inner")
            .withColumn("rtx", F.coalesce(F.col("tx_type"), F.col("parent_rtx")))
            .drop("parent_rtx")
        )

    study_events = child_resolve(odm.study_events, subjects, _PATH["subjects"])
    forms = child_resolve(odm.forms, study_events, _PATH["study_events"])
    item_groups = child_resolve(odm.item_groups, forms, _PATH["forms"])
    items = child_resolve(odm.items, item_groups, _PATH["item_groups"])
    return OdmTables(odm.files, subjects, study_events, forms, item_groups, items)


def _keyfn(flavor: str):
    """'md5' = oracle-checkable uuid3 string flavor; 'sha1' = RFC-4122
    UUIDv5 with reference byte-parity (functions/keys.py)."""
    return {"md5": uuid3_str_col, "sha1": uuid5_col}[flavor]


def with_entity_ids(df: DataFrame, upto: str, flavor: str = "md5") -> DataFrame:
    """Chain of deterministic ids down the OID path (SURVEY.md §1.1).

    Built stepwise with withColumn so Catalyst keeps one hash per level
    (CollapseProject won't inline non-cheap exprs referenced 6x)."""
    key = _keyfn(flavor)
    df = df.withColumn("study_id", key(NIL_UUID, [F.col("study_oid")]))
    levels = [
        ("subject_id", "study_id", "subject_key"),
        ("study_event_id", "subject_id", "study_event_oid"),
        ("form_id", "study_event_id", "form_oid"),
        ("item_group_id", "form_id", "item_group_oid"),
        ("item_id", "item_group_id", "item_oid"),
    ]
    stop = {
        "subjects": "subject_id",
        "study_events": "study_event_id",
        "forms": "form_id",
        "item_groups": "item_group_id",
        "items": "item_id",
    }[upto]
    for out, ns, part in levels:
        df = df.withColumn(out, key(F.col(ns), [F.col(part)]))
        if out == stop:
            break
    return df


def _null(name):
    return F.lit(None).cast("string").alias(name)


# params whose values are entity uuids — clj-uuid encodes these as their
# 16 raw bytes in the v5 name payload (reference util.clj UUIDNameBytes)
_UUID_PARAMS = frozenset(
    {"study-id", "subject-id", "study-event-id", "form-id", "item-group-id", "item-id"}
)
_NIL_SENTINEL = ":nil"  # deterministic stand-in for a NULL param value


def _payload(name_col, params: dict, flavor: str = "md5"):
    """The cmd-id hash payload: ':name' ++ sorted ':key' value pairs
    (A18, reference ``gen-cmd-id`` at ``import_clinical_data.clj:288-289``:
    ``(conj (flatten (sort-by first params)) name)``).  ``name_col`` is a
    Column so one projection covers every verb of a level.

    NULL values (e.g. empty ItemData text from the XML path) coalesce to
    a sentinel — ``F.concat`` would otherwise null the whole payload and
    every null-valued command would collapse onto one degenerate id.
    The DuckDB oracle (`oracle._cmd_select`) applies the same sentinel.

    flavor='md5' hashes one canonical string.  flavor='sha1' hashes the
    clj-uuid BYTE encoding: keywords as their ':kw' UTF-8 form, uuid
    params as 16 raw bytes (UUIDNameBytes), strings as UTF-8.  Remaining
    parity delta, by design: typed item values (integer/float/datetime)
    are hashed via their canonical *string* form, where the reference
    hands clj-uuid the typed object — see generate_commands docstring."""
    if flavor == "md5":
        parts = [F.concat(F.lit(":"), name_col)]
        for k in sorted(params):
            parts.append(F.lit(":" + k))
            parts.append(F.coalesce(params[k].cast("string"), F.lit(_NIL_SENTINEL)))
        return F.concat(*parts)
    parts = [F.concat(F.lit(":"), name_col).cast("binary")]
    for k in sorted(params):
        parts.append(F.lit(":" + k).cast("binary"))
        if k in _UUID_PARAMS:
            # the :nil sentinel applies ONLY when the source column itself
            # is NULL (reachable via the XML path when an entity OID is
            # missing) — a malformed non-hex uuid string must stay a NULL
            # payload (unhex -> NULL nulls the whole concat, surfacing as
            # a detectable NULL cmd_id) rather than silently sharing the
            # sentinel bytes with genuinely-absent params
            parts.append(
                F.when(params[k].isNull(), F.lit(_NIL_SENTINEL).cast("binary")).otherwise(
                    F.unhex(F.regexp_replace(params[k], "-", ""))
                )
            )
        else:
            parts.append(
                F.coalesce(params[k].cast("string"), F.lit(_NIL_SENTINEL)).cast("binary")
            )
    return F.concat(*parts)


def _level_commands(df, batch_cmd_id, sub, entity, params, out, item_level=False, flavor="md5"):
    """ONE projection per hierarchy level: the verb is resolved per-row
    (CASE on rtx) instead of fanning out per-verb branches — a single
    scan of the level instead of three, which is what survives a 100x
    scale-up."""
    name = F.concat(F.lit("odm-import/"), F.col("rtx"), F.lit(f"-{entity}"))
    hp = dict(params)
    hp["file-oid"] = F.col("file_oid")
    if not item_level:
        df = df.where(F.col("rtx") != "update")  # interior update: cascade only
        payload = _payload(name, hp, flavor)
    else:
        # items: insert/upsert carry {item-group-id,item-oid,data-type,value};
        # update targets {item-id,data-type,value}; remove drops the value
        ins = _payload(name, hp, flavor)
        upd = _payload(
            name,
            {
                "data-type": F.col("data_type"),
                "file-oid": F.col("file_oid"),
                "item-id": F.col("item_id"),
                "value": F.col("value_canon"),
            },
            flavor,
        )
        rem = _payload(
            name,
            {
                "file-oid": F.col("file_oid"),
                "item-group-id": F.col("item_group_id"),
                "item-oid": F.col("item_oid"),
            },
            flavor,
        )
        payload = (
            F.when(F.col("rtx") == "update", upd)
            .when(F.col("rtx") == "remove", rem)
            .otherwise(ins)
        )
    batch_ns = batch_cmd_id if isinstance(batch_cmd_id, Column) else F.lit(batch_cmd_id)
    sub_col = sub if isinstance(sub, Column) else F.lit(sub)
    # NULL-payload guard (ADVICE r4; shared helper since r6): a
    # malformed non-hex uuid param nulls the sha1 payload — without a
    # guard the uuid formatter folds that into one shared degenerate id
    # (empty string), silently breaking the A18 idempotency/dedupe
    # contract.  See functions/keys.guard_payload for the
    # payload-not-uuid placement rationale.
    guarded_payload = guard_payload(
        payload,
        F.concat(
            F.lit(f"generate_commands: NULL cmd-id payload at {entity} level "
                  "(malformed uuid param?) file_oid="),
            F.coalesce(F.col("file_oid"), F.lit("<NULL>")),
        ),
        cast_type="binary" if flavor == "sha1" else "string",
    )
    cols = [
        # on_null="empty": guarded_payload above already raises with a
        # CONTEXTUAL message (entity level + file_oid); the formatter's
        # default generic guard would be a redundant second coalesce.
        _keyfn(flavor)(batch_ns, [guarded_payload], on_null="empty").alias("cmd_id"),
        name.alias("name"),
        sub_col.alias("sub"),
    ]
    for c in COMMAND_COLUMNS[3:]:
        if c not in out:
            cols.append(_null(c))
        elif item_level and c == "item_id":
            cols.append(F.when(F.col("rtx") == "update", F.col("item_id")).alias(c))
        elif item_level and c in ("data_type", "value_canon"):
            cols.append(F.when(F.col("rtx") != "remove", F.col(out[c])).alias(c))
        else:
            cols.append(F.col(out[c]).alias(c))
    return df.select(*cols)


def resolve_and_identify(odm: OdmTables, flavor: str = "md5") -> OdmTables:
    """resolve_tx + entity ids in one top-down pass: each level's
    resolve join carries the PARENT's id down, so a level computes only
    its own hash (items: 1 chain hash instead of 6 — the id chain is
    evaluated once per ancestor row, not once per descendant row)."""
    key = _keyfn(flavor)
    subjects = (
        odm.subjects.withColumn("rtx", F.coalesce(F.col("tx_type"), F.lit("insert")))
        .withColumn("study_id", key(NIL_UUID, [F.col("study_oid")]))
        .withColumn("subject_id", key(F.col("study_id"), [F.col("subject_key")]))
    )

    def child(child_df, parent, keys, parent_id, own_id, own_part):
        p = parent.where(F.col("rtx") != "remove").select(
            *keys, F.col("rtx").alias("parent_rtx"), F.col(parent_id)
        )
        return (
            child_df.join(p, keys, "inner")
            .withColumn("rtx", F.coalesce(F.col("tx_type"), F.col("parent_rtx")))
            .drop("parent_rtx")
            .withColumn(own_id, key(F.col(parent_id), [F.col(own_part)]))
        )

    se = child(odm.study_events, subjects, _PATH["subjects"], "subject_id", "study_event_id", "study_event_oid")
    form = child(odm.forms, se, _PATH["study_events"], "study_event_id", "form_id", "form_oid")
    ig = child(odm.item_groups, form, _PATH["forms"], "form_id", "item_group_id", "item_group_oid")
    item = child(odm.items, ig, _PATH["item_groups"], "item_group_id", "item_id", "item_oid")
    return OdmTables(odm.files, subjects, se, form, ig, item)


def generate_commands(
    odm: OdmTables,
    batch_cmd_id: str | Column,
    sub: str | Column,
    persist: bool = True,
    flavor: str = "md5",
) -> DataFrame:
    """The full per-level command set as one flat DataFrame.

    ``batch_cmd_id`` is the id-namespace: a scalar uuid string (single
    batch command), the :data:`PER_FILE` sentinel (multi-file batch —
    each row's namespace derives from its ``file_oid``, same flavor as
    the command hashing), or an explicit Column expression (e.g.
    :func:`batch_cmd_id_map` for externally-assigned per-file ids).
    ``sub`` likewise accepts a Column for per-file submitters.

    ``persist`` caches each resolved level before fan-out — the level
    frontier feeds both its own command projection and the child
    level's resolve join.  Measured cold-session at sf0.1: 12.7s with
    persist vs 18.9s without (warm-session A/Bs invert this — beware
    run-order bias when re-measuring).  ``flavor='sha1'`` switches
    every id to true RFC-4122 UUIDv5 with the reference's clj-uuid name
    encoding: entity-id chains are byte-exact (golden-pinned,
    tests/test_keys.py), and cmd-id payloads encode uuid params as 16
    raw bytes per UUIDNameBytes (reference util.clj:32-43).  One
    documented delta remains: typed item VALUES are hashed via their
    canonical string form, where the reference hands clj-uuid the typed
    Long/Double/DateTime object — so real-world cmd ids for
    integer/float/datetime item values may differ.  Not DuckDB-checkable
    (this DuckDB lacks sha1); pinned in tests instead.

    Pre-resolved input (levels already carrying ``rtx`` + entity ids,
    e.g. from ``odm.derive_odm_resolved``'s join-free fused path) is
    detected and used as-is — no resolve joins, no level persists."""
    if isinstance(batch_cmd_id, str) and batch_cmd_id == PER_FILE:
        batch_cmd_id = per_file_batch_cmd_id(flavor)
    if "rtx" in odm.subjects.columns:
        r = odm  # fused/denormalized path: already resolved + identified
        persist = False
    else:
        r = resolve_and_identify(odm, flavor)
    subj, se, form, ig, item = r.subjects, r.study_events, r.forms, r.item_groups, r.items
    if persist:
        for df in (subj, se, form, ig):
            df.persist()

    out = [
        _level_commands(
            subj, batch_cmd_id, sub, "subject",
            {"study-id": F.col("study_id"), "subject-key": F.col("subject_key")},
            {"file_oid": "file_oid", "study_oid": "study_oid", "subject_key": "subject_key", "parent_id": "study_id"},
            flavor=flavor,
        ),
        _level_commands(
            se, batch_cmd_id, sub, "study-event",
            {"subject-id": F.col("subject_id"), "study-event-oid": F.col("study_event_oid")},
            {
                "file_oid": "file_oid", "study_oid": "study_oid", "subject_key": "subject_key",
                "study_event_oid": "study_event_oid", "parent_id": "subject_id",
            },
            flavor=flavor,
        ),
        _level_commands(
            form, batch_cmd_id, sub, "form",
            {"study-event-id": F.col("study_event_id"), "form-oid": F.col("form_oid")},
            {
                "file_oid": "file_oid", "study_oid": "study_oid", "subject_key": "subject_key",
                "study_event_oid": "study_event_oid", "form_oid": "form_oid",
                "parent_id": "study_event_id",
            },
            flavor=flavor,
        ),
        _level_commands(
            ig, batch_cmd_id, sub, "item-group",
            {"form-id": F.col("form_id"), "item-group-oid": F.col("item_group_oid")},
            {
                "file_oid": "file_oid", "study_oid": "study_oid", "subject_key": "subject_key",
                "study_event_oid": "study_event_oid", "form_oid": "form_oid",
                "item_group_oid": "item_group_oid", "parent_id": "form_id",
            },
            flavor=flavor,
        ),
        _level_commands(
            item, batch_cmd_id, sub, "item",
            {
                "data-type": F.col("data_type"),
                "item-group-id": F.col("item_group_id"),
                "item-oid": F.col("item_oid"),
                "value": F.col("value_canon"),
            },
            {
                "file_oid": "file_oid", "study_oid": "study_oid", "subject_key": "subject_key",
                "study_event_oid": "study_event_oid", "form_oid": "form_oid",
                "item_group_oid": "item_group_oid", "item_oid": "item_oid",
                "data_type": "data_type", "value_canon": "value_canon",
                "parent_id": "item_group_id", "item_id": "item_id",
            },
            item_level=True,
            flavor=flavor,
        ),
    ]
    return reduce(lambda a, b: a.unionByName(b), out)


def generate_commands_single_pass(
    subjects: DataFrame,
    study_events: DataFrame,
    denorm: DataFrame,
    batch_cmd_id: str | Column,
    sub: str | Column,
    item_attrs: list[tuple[str, str]],
    ig_oid: str = "IG1",
    flavor: str = "md5",
) -> DataFrame:
    """``generate_commands`` for a DENORMALIZED form-grain source, with
    the forms / item-groups / items arms fused into ONE pass (r15 —
    guide §2.4/§5): the generic fused path reads a persisted form-grain
    frontier three times (cache build + 3 InMemoryTableScan consumers,
    ~9 AQE jobs at sf0.1); here each form-grain row emits its form,
    item-group and item command structs in a single projection
    (array → filter(keep) → inline), so the window+join frontier is
    computed exactly once with no cache materialization and no
    multi-job union fan.  Row-identical to
    ``generate_commands(derive_odm_resolved(...))`` — pinned by
    tests/test_odm_commands.py::test_fused_equals_generic.

    ``denorm`` columns: the five path cols, ``form_tx``/``form_rtx``
    (resolved), ``study_event_id``/``form_id``, and one ``val_<OID>``
    canonical-value column per ``(OID, data_type)`` in ``item_attrs``.
    The derivation contract baked in (same as ``derive_odm_resolved``):
    one item group ``ig_oid`` per form and neither item groups nor
    items carry their own tx (both inherit ``form_rtx``).

    Hash volume is unchanged vs the generic path: one cmd-id hash per
    SURVIVING command row (hashed after the keep-filter), the
    item-group id once per form-grain row, and item ids lazily inside
    the update branches only.  The shared ``item_group_id`` hash lives
    in its own projection (CollapseProject keeps a non-cheap alias
    referenced 12x) so the CASE branches reference a column, not a
    re-evaluated md5 (the r8 ivf_knn CSE lesson)."""
    if isinstance(batch_cmd_id, str) and batch_cmd_id == PER_FILE:
        batch_cmd_id = per_file_batch_cmd_id(flavor)
    key = _keyfn(flavor)

    subj_arm = _level_commands(
        subjects, batch_cmd_id, sub, "subject",
        {"study-id": F.col("study_id"), "subject-key": F.col("subject_key")},
        {"file_oid": "file_oid", "study_oid": "study_oid", "subject_key": "subject_key", "parent_id": "study_id"},
        flavor=flavor,
    )
    se_arm = _level_commands(
        study_events, batch_cmd_id, sub, "study-event",
        {"subject-id": F.col("subject_id"), "study-event-oid": F.col("study_event_oid")},
        {
            "file_oid": "file_oid", "study_oid": "study_oid", "subject_key": "subject_key",
            "study_event_oid": "study_event_oid", "parent_id": "subject_id",
        },
        flavor=flavor,
    )

    rtx = F.col("form_rtx")
    path = {c: F.col(c) for c in ("file_oid", "study_oid", "subject_key", "study_event_oid", "form_oid")}
    nulls = {c: _null(c) for c in COMMAND_COLUMNS[3:]}

    def name_of(entity: str) -> Column:
        return F.concat(F.lit("odm-import/"), rtx, F.lit(f"-{entity}"))

    def cmd_struct(keep: Column, name: Column, payload: Column, **out: Column) -> Column:
        fields = [keep.alias("keep"), name.alias("name"), payload.alias("payload")]
        for c in COMMAND_COLUMNS[3:]:
            fields.append((out.get(c) if c in out else nulls[c]).alias(c))
        return F.struct(*fields)

    form_name = name_of("form")
    form_struct = cmd_struct(
        rtx != "update",
        form_name,
        _payload(
            form_name,
            {"study-event-id": F.col("study_event_id"), "form-oid": F.col("form_oid"),
             "file-oid": F.col("file_oid")},
            flavor,
        ),
        **path,
        parent_id=F.col("study_event_id"),
    )

    ig_name = name_of("item-group")
    ig_struct = cmd_struct(
        (rtx != "remove") & (rtx != "update"),
        ig_name,
        _payload(
            ig_name,
            {"form-id": F.col("form_id"), "item-group-oid": F.lit(ig_oid),
             "file-oid": F.col("file_oid")},
            flavor,
        ),
        **path,
        item_group_oid=F.lit(ig_oid),
        parent_id=F.col("form_id"),
    )

    item_name = name_of("item")
    item_structs = []
    for oid, dtype in item_attrs:
        iid = key(F.col("item_group_id"), [F.lit(oid)])
        value = F.col(f"val_{oid}")
        ins = _payload(
            item_name,
            {"data-type": F.lit(dtype), "item-group-id": F.col("item_group_id"),
             "item-oid": F.lit(oid), "value": value, "file-oid": F.col("file_oid")},
            flavor,
        )
        upd = _payload(
            item_name,
            {"data-type": F.lit(dtype), "file-oid": F.col("file_oid"),
             "item-id": iid, "value": value},
            flavor,
        )
        rem = _payload(
            item_name,
            {"file-oid": F.col("file_oid"), "item-group-id": F.col("item_group_id"),
             "item-oid": F.lit(oid)},
            flavor,
        )
        item_structs.append(
            cmd_struct(
                rtx != "remove",
                item_name,
                F.when(rtx == "update", upd).when(rtx == "remove", rem).otherwise(ins),
                **path,
                item_group_oid=F.lit(ig_oid),
                item_oid=F.lit(oid),
                data_type=F.when(rtx != "remove", F.lit(dtype)),
                value_canon=F.when(rtx != "remove", value),
                parent_id=F.col("item_group_id"),
                item_id=F.when(rtx == "update", iid),
            )
        )

    exploded = (
        denorm.withColumn("item_group_id", key(F.col("form_id"), [F.lit(ig_oid)]))
        .select(
            F.inline(
                F.filter(
                    F.array(form_struct, ig_struct, *item_structs),
                    lambda s: s["keep"],
                )
            )
        )
    )

    batch_ns = batch_cmd_id if isinstance(batch_cmd_id, Column) else F.lit(batch_cmd_id)
    sub_col = sub if isinstance(sub, Column) else F.lit(sub)
    guarded_payload = guard_payload(
        F.col("payload"),
        F.concat(
            F.lit("generate_commands: NULL cmd-id payload "
                  "(malformed uuid param?) file_oid="),
            F.coalesce(F.col("file_oid"), F.lit("<NULL>")),
        ),
        cast_type="binary" if flavor == "sha1" else "string",
    )
    denorm_arm = exploded.select(
        _keyfn(flavor)(batch_ns, [guarded_payload], on_null="empty").alias("cmd_id"),
        F.col("name"),
        sub_col.alias("sub"),
        *[F.col(c) for c in COMMAND_COLUMNS[3:]],
    )
    return subj_arm.unionByName(se_arm).unionByName(denorm_arm)


def dispatch_commands(
    cmds: DataFrame,
    handlers: dict,
    persist: bool = True,
) -> tuple[dict[str, DataFrame], DataFrame]:
    """The reference's OPEN ``handle-command`` multimethod
    (``broker.clj:55`` — dispatch on ``:name``, unhandled names error →
    reject) restated set-at-a-time: each registered name's rows flow
    through that handler's DataFrame transform, and rows whose name has
    NO handler come back as the reject side (route them to a
    dead-letter/requeue sink; silently dropping them would hide exactly
    the bug the multimethod's no-default error surfaces).

    ``handlers``: ``{command_name: fn(DataFrame) -> DataFrame}`` —
    the extension point (SURVEY B10): downstream systems register new
    verbs without touching this engine, the same openness the
    multimethod gives Clojure consumers.

    ``persist`` localCheckpoints the source once — each consumer's lazy
    result re-executes the upstream plan otherwise, and the consumer
    count is ``len(handlers) + 1``: the unhandled reject frame always
    reads the source too, so even a single-handler dispatch re-derives
    twice without it (r8 review).  Callers embedding this in a larger
    cached pipeline can pass False.

    Returns ``(handled, unhandled)`` with ``handled[name]`` the
    handler's output for that verb's rows.
    """
    if persist and handlers:
        cmds = local_ckpt(cmds, eager=False)
    handled = {
        name: fn(cmds.where(F.col("name") == name)) for name, fn in handlers.items()
    }
    unhandled = cmds.where(~F.col("name").isin(*handlers) | F.col("name").isNull())
    return handled, unhandled
