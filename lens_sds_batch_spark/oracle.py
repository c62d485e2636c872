"""DuckDB oracle SQL for the ODM pipeline queries.

Independent re-statement of ``plans/odm.derive_odm_from_tpch`` +
``plans/commands.generate_commands`` in DuckDB SQL, used by
``__spark_entry__.oracle_sql()``.  The deterministic-id algebra is the
md5 "uuid3_str" flavor (see ``functions/keys.py`` — DuckDB v1.0 has no
sha1).  Entity-id chains use DuckDB lateral column aliases so the
generated SQL stays linear in depth instead of exponentiating.

KEEP IN SYNC with plans/odm.py + plans/commands.py — the driver's
hash-compare is the enforcement.
"""

from __future__ import annotations

from .functions.keys import _HEX, _VARIANT_MAP
from .plans.odm import BATCH_CMD_ID, FILE_OID, ITEM_ATTRS, SUB

NIL_HEX = "0" * 32


def duck_fmt(h: str, version: str = "3") -> str:
    """Format a 32-hex-char md5 column/expr ``h`` as an RFC-4122 uuid
    string with the given version nibble + forced variant."""
    return (
        f"(substr({h},1,8) || '-' || substr({h},9,4) || '-{version}' || substr({h},14,3)"
        f" || '-' || translate(substr({h},17,1), '{_HEX}', '{_VARIANT_MAP}')"
        f" || substr({h},18,3) || '-' || substr({h},21,12))"
    )


def duck_uuid3(ns_sql: str, parts: list[str], h_alias: str, out: str) -> str:
    """Emit ``md5(payload) AS {h_alias}, {fmt} AS {out}`` — for use in a
    SELECT list with lateral aliases (chainable)."""
    payload = " || ".join([ns_sql] + [f"CAST({p} AS VARCHAR)" for p in parts])
    return f"md5({payload}) AS {h_alias}, {duck_fmt(h_alias)} AS {out}"


def ns_hex(id_sql: str) -> str:
    return f"lower(replace({id_sql}, '-', ''))"


# ---------------------------------------------------------------------------
# Derived ODM tree (mirror of plans/odm.derive_odm_from_tpch)
# ---------------------------------------------------------------------------

SUBJECT_TX = (
    "CASE WHEN c_custkey % 10 <= 3 THEN NULL"
    " WHEN c_custkey % 10 <= 5 THEN 'insert'"
    " WHEN c_custkey % 10 = 6 THEN 'update'"
    " WHEN c_custkey % 10 = 7 THEN 'upsert'"
    " WHEN c_custkey % 10 = 8 THEN 'remove'"
    " ELSE 'insert' END"
)
SE_TX = (
    "CASE o_orderkey % 7 WHEN 0 THEN 'update' WHEN 1 THEN 'remove'"
    " WHEN 2 THEN 'upsert' ELSE NULL END"
)
FORM_TX = (
    "CASE (l_orderkey + l_linenumber) % 5 WHEN 0 THEN 'update'"
    " WHEN 1 THEN 'remove' ELSE NULL END"
)

_VALUE_CANON = {
    "float": lambda c: f"CAST(CAST({c} AS DECIMAL(18,2)) AS VARCHAR)",
    "date-time": lambda c: f"CAST(CAST(epoch({c}) AS BIGINT) AS VARCHAR)",
    "integer": lambda c: f"CAST({c} AS VARCHAR)",
    "string": lambda c: f"CAST({c} AS VARCHAR)",
}


def _items_union(tx_sql=None) -> str:
    """Per-ITEM_ATTRS SELECT union over the ``li`` CTE — the ONE copy of
    the item-row shape (path columns, 'IG1' group, typed value canon).
    ``tx_sql(oid)`` supplies the tx column fragment spliced between
    item_oid and data_type; the default is the single NULL ``tx_type``
    of the derived-tree oracle, ``operators/xml_ingest`` passes the
    full per-level tx set with its mixers."""
    tx_sql = tx_sql or (lambda oid: "CAST(NULL AS VARCHAR) AS tx_type")
    selects = []
    for oid, dtype, src in ITEM_ATTRS:
        selects.append(
            "SELECT file_oid, study_oid, subject_key, study_event_oid, form_oid,"
            " 'IG1' AS item_group_oid,"
            f" '{oid}' AS item_oid, {tx_sql(oid)},"
            f" '{dtype}' AS data_type, {_VALUE_CANON[dtype](src)} AS value_canon"
            " FROM li"
        )
    return " UNION ALL ".join(selects)


def odm_resolution_ctes(ids: bool = True) -> str:
    """Tx resolution (+ id chains when ``ids``) as a WITH-clause body
    fragment, reading from relations named ``subjects / study_events /
    forms / item_groups / items`` — either the derivation CTEs of
    :func:`odm_ctes` or externally registered views (the crafted-input
    tests drive multi-byte OID trees through exactly this SQL, so the
    resolution/id/command algebra under test is byte-identical to the
    gate's)."""
    body = f"""
subjects_r AS MATERIALIZED (SELECT *, coalesce(tx_type, 'insert') AS rtx FROM subjects),
se_r AS MATERIALIZED (
  SELECT c.*, coalesce(c.tx_type, p.rtx) AS rtx
  FROM study_events c
  JOIN subjects_r p USING (file_oid, study_oid, subject_key)
  WHERE p.rtx <> 'remove'
),
forms_r AS MATERIALIZED (
  SELECT c.*, coalesce(c.tx_type, p.rtx) AS rtx
  FROM forms c
  JOIN se_r p USING (file_oid, study_oid, subject_key, study_event_oid)
  WHERE p.rtx <> 'remove'
),
igs_r AS MATERIALIZED (
  SELECT c.*, coalesce(c.tx_type, p.rtx) AS rtx
  FROM item_groups c
  JOIN forms_r p USING (file_oid, study_oid, subject_key, study_event_oid, form_oid)
  WHERE p.rtx <> 'remove'
),
items_r AS MATERIALIZED (
  SELECT c.*, coalesce(c.tx_type, p.rtx) AS rtx
  FROM items c
  JOIN igs_r p USING (file_oid, study_oid, subject_key, study_event_oid, form_oid, item_group_oid)
  WHERE p.rtx <> 'remove'
)"""
    if not ids:
        return body
    return body + f""",
subj_ids AS MATERIALIZED (
  SELECT *,
    {duck_uuid3(f"'{NIL_HEX}'", ["study_oid"], "h0", "study_id")},
    {duck_uuid3(ns_hex("study_id"), ["subject_key"], "h1", "subject_id")}
  FROM subjects_r
),
se_ids AS MATERIALIZED (
  SELECT c.*, p.study_id, p.subject_id,
    {duck_uuid3(ns_hex("p.subject_id"), ["c.study_event_oid"], "h2", "study_event_id")}
  FROM se_r c JOIN subj_ids p USING (file_oid, study_oid, subject_key)
),
form_ids AS MATERIALIZED (
  SELECT c.*, p.study_id, p.subject_id, p.study_event_id,
    {duck_uuid3(ns_hex("p.study_event_id"), ["c.form_oid"], "h3", "form_id")}
  FROM forms_r c
  JOIN se_ids p USING (file_oid, study_oid, subject_key, study_event_oid)
),
ig_ids AS MATERIALIZED (
  SELECT c.*, p.study_id, p.subject_id, p.study_event_id, p.form_id,
    {duck_uuid3(ns_hex("p.form_id"), ["c.item_group_oid"], "h4", "item_group_id")}
  FROM igs_r c
  JOIN form_ids p USING (file_oid, study_oid, subject_key, study_event_oid, form_oid)
),
item_ids AS MATERIALIZED (
  SELECT c.*, p.study_id, p.subject_id, p.study_event_id, p.form_id, p.item_group_id,
    {duck_uuid3(ns_hex("p.item_group_id"), ["c.item_oid"], "h5", "item_id")}
  FROM items_r c
  JOIN ig_ids p USING (file_oid, study_oid, subject_key, study_event_oid, form_oid, item_group_oid)
)"""


def odm_ctes(ids: bool = True) -> str:
    """The WITH-clause body: derivation + tx resolution (+ id chains
    when ``ids``).  ``ids=False`` stops at the *_r CTEs — DuckDB
    executes MATERIALIZED CTEs even when unreferenced, so the
    hash-free uuid5 oracle must not emit the md5-chain CTEs at
    all (they are appended as a separate tail only when ``ids``)."""
    form_path = (
        f"'{FILE_OID}' AS file_oid,"
        " 'ST' || CAST(o_custkey % 3 AS VARCHAR) AS study_oid,"
        " 'SK' || CAST(o_custkey AS VARCHAR) AS subject_key,"
        " 'SE' || CAST(l_orderkey AS VARCHAR) AS study_event_oid,"
        " 'FM' || CAST(form_seq AS VARCHAR) AS form_oid"
    )
    body = f"""
subjects AS (
  SELECT '{FILE_OID}' AS file_oid,
         'ST' || CAST(c_custkey % 3 AS VARCHAR) AS study_oid,
         'SK' || CAST(c_custkey AS VARCHAR) AS subject_key,
         {SUBJECT_TX} AS tx_type
  FROM customer
),
study_events AS (
  SELECT '{FILE_OID}' AS file_oid,
         'ST' || CAST(o_custkey % 3 AS VARCHAR) AS study_oid,
         'SK' || CAST(o_custkey AS VARCHAR) AS subject_key,
         'SE' || CAST(o_orderkey AS VARCHAR) AS study_event_oid,
         {SE_TX} AS tx_type
  FROM orders
),
li AS MATERIALIZED (
  SELECT {form_path},
         l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag,
         l_shipdate, l_partkey
  FROM (
    SELECT l.*, o.o_custkey,
           row_number() OVER (
             PARTITION BY l_orderkey
             ORDER BY l_linenumber, l_partkey, l_suppkey, l_quantity,
                      l_extendedprice, l_discount, l_tax, l_returnflag,
                      l_linestatus, l_shipdate
           ) AS form_seq
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  )
),
forms AS (
  SELECT file_oid, study_oid, subject_key, study_event_oid, form_oid,
         {FORM_TX} AS tx_type
  FROM li
),
item_groups AS (
  SELECT file_oid, study_oid, subject_key, study_event_oid, form_oid,
         'IG1' AS item_group_oid, CAST(NULL AS VARCHAR) AS tx_type
  FROM li
),
items AS ({_items_union()}),"""
    return body + odm_resolution_ctes(ids)



# ---------------------------------------------------------------------------
# Command projections (mirror of plans/commands.generate_commands)
# ---------------------------------------------------------------------------

_OUT_COLS = (
    "file_oid", "study_oid", "subject_key", "study_event_oid", "form_oid",
    "item_group_oid", "item_oid", "data_type", "value_canon", "parent_id", "item_id",
)


def _cmd_select(src: str, rtx: str, verb_entity: str, params: dict[str, str], out: dict[str, str]) -> str:
    name = f"odm-import/{verb_entity}"
    hp = dict(params)
    hp["file-oid"] = "file_oid"
    parts = [f"':{name}'"]
    for k in sorted(hp):
        parts.append(f"':{k}'")
        parts.append(hp[k])
    # coalesce mirrors plans/commands._payload's NULL sentinel — a null
    # param value (possible via the XML path) must hash deterministically
    # and identically in both engines, not null the whole payload
    payload = " || ".join(
        [ns_hex(f"'{BATCH_CMD_ID}'")]
        + [f"coalesce(CAST({p} AS VARCHAR), ':nil')" for p in parts]
    )
    outs = ", ".join(
        (f"{out[c]} AS {c}" if c in out else f"CAST(NULL AS VARCHAR) AS {c}") for c in _OUT_COLS
    )
    return (
        f"SELECT {duck_fmt('__ch')} AS cmd_id, '{name}' AS name, '{SUB}' AS sub, {outs} "
        f"FROM (SELECT *, md5({payload}) AS __ch FROM {src} WHERE rtx = '{rtx}')"
    )


def _cmd_select_nohash(src: str, rtx: str, verb_entity: str, out: dict[str, str]) -> str:
    """Non-hash projection of one level×verb: the uuid5-flavor oracle
    (odm_commands_nohash_sql) checks every column EXCEPT the ids, so it
    reads from the *_r CTEs and never evaluates the md5 chains — the
    *_ids CTEs are unreferenced and pruned, cutting the oracle from
    ~94s to seconds at sf0.01."""
    name = f"odm-import/{verb_entity}"
    cols = [c for c in _OUT_COLS if c not in ("parent_id", "item_id")]
    outs = ", ".join(
        (f"{out[c]} AS {c}" if c in out else f"CAST(NULL AS VARCHAR) AS {c}") for c in cols
    )
    return (
        f"SELECT '{name}' AS name, '{SUB}' AS sub, {outs}, 1 AS ids_wellformed "
        f"FROM {src} WHERE rtx = '{rtx}'"
    )


def odm_commands_nohash_sql() -> str:
    """The uuid5-flavor oracle: identical command rows minus the sha1
    id columns (DuckDB has no sha1), plus the literal well-formedness
    flag the Spark side computes per row."""
    sub_out = {"file_oid": "file_oid", "study_oid": "study_oid", "subject_key": "subject_key"}
    se_out = dict(sub_out, study_event_oid="study_event_oid")
    fm_out = dict(se_out, form_oid="form_oid")
    ig_out = dict(fm_out, item_group_oid="item_group_oid")
    it_out = dict(ig_out, item_oid="item_oid")
    it_val_out = dict(it_out, data_type="data_type", value_canon="value_canon")

    selects = []
    for verb in ("insert", "upsert", "remove"):
        selects.append(_cmd_select_nohash("subjects_r", verb, f"{verb}-subject", sub_out))
        selects.append(_cmd_select_nohash("se_r", verb, f"{verb}-study-event", se_out))
        selects.append(_cmd_select_nohash("forms_r", verb, f"{verb}-form", fm_out))
        selects.append(_cmd_select_nohash("igs_r", verb, f"{verb}-item-group", ig_out))
    for verb in ("insert", "upsert", "update"):
        selects.append(_cmd_select_nohash("items_r", verb, f"{verb}-item", it_val_out))
    selects.append(_cmd_select_nohash("items_r", "remove", "remove-item", it_out))
    return "WITH " + odm_ctes(ids=False) + "\n" + "\nUNION ALL\n".join(selects)


def command_selects() -> list[str]:
    """The per-level×verb command SELECTs (reading the *_ids CTEs) —
    shared by the gate oracle and the crafted-input (multi-byte OID)
    parity tests so both run the identical command algebra."""
    sub_params = {"study-id": "study_id", "subject-key": "subject_key"}
    sub_out = {"file_oid": "file_oid", "study_oid": "study_oid", "subject_key": "subject_key", "parent_id": "study_id"}
    se_params = {"subject-id": "subject_id", "study-event-oid": "study_event_oid"}
    se_out = dict(sub_out, study_event_oid="study_event_oid", parent_id="subject_id")
    fm_params = {"study-event-id": "study_event_id", "form-oid": "form_oid"}
    fm_out = dict(se_out, form_oid="form_oid", parent_id="study_event_id")
    ig_params = {"form-id": "form_id", "item-group-oid": "item_group_oid"}
    ig_out = dict(fm_out, item_group_oid="item_group_oid", parent_id="form_id")
    it_out = dict(ig_out, item_oid="item_oid", parent_id="item_group_id")
    it_val_out = dict(it_out, data_type="data_type", value_canon="value_canon")
    iv_params = {
        "item-group-id": "item_group_id", "item-oid": "item_oid",
        "data-type": "data_type", "value": "value_canon",
    }

    selects = []
    for verb in ("insert", "upsert", "remove"):
        selects.append(_cmd_select("subj_ids", verb, f"{verb}-subject", sub_params, sub_out))
        selects.append(_cmd_select("se_ids", verb, f"{verb}-study-event", se_params, se_out))
        selects.append(_cmd_select("form_ids", verb, f"{verb}-form", fm_params, fm_out))
        selects.append(_cmd_select("ig_ids", verb, f"{verb}-item-group", ig_params, ig_out))
    for verb in ("insert", "upsert"):
        selects.append(_cmd_select("item_ids", verb, f"{verb}-item", iv_params, it_val_out))
    selects.append(
        _cmd_select(
            "item_ids", "update", "update-item",
            {"item-id": "item_id", "data-type": "data_type", "value": "value_canon"},
            dict(it_val_out, item_id="item_id"),
        )
    )
    selects.append(_cmd_select("item_ids", "remove", "remove-item", {"item-group-id": "item_group_id", "item-oid": "item_oid"}, it_out))
    return selects


def odm_commands_sql() -> str:
    return "WITH " + odm_ctes() + "\n" + "\nUNION ALL\n".join(command_selects())
