"""Multi-byte text through the FLAGSHIP id chain (r10 verdict #3).

r10 gated unicode parity for the four documents-only packs, but the ODM
path — UTF-8 OID/subject-key/value bytes flowing through the entity-id
chains and sha1/md5 cmd-id hashing (``functions/keys.py:294,386``) —
was pinned only on ASCII goldens plus the reference's pinned vector.
These tests drive a crafted ODM tree whose OIDs, subject keys, and item
values span accented Latin, Cyrillic, Greek, CJK, sharp-s, and
astral-plane emoji through the REAL pipeline and comparators:

- md5 flavor: ``generate_commands`` vs the gate oracle's own
  resolution/id/command SQL (``oracle.odm_resolution_ctes`` +
  ``oracle.command_selects`` — the byte-identical algebra the driver
  gate runs) over the same crafted tables in DuckDB, compared through
  ``drive_driver.compare_one`` (schema + type families + value
  multiset).  This is the cross-engine claim: Spark md5(UTF-8 bytes)
  == DuckDB md5(UTF-8 bytes) on multi-byte payloads, joins on
  multi-byte keys agree, and the command fan-out is identical.
- sha1 flavor: every cmd_id and entity id re-derived in pure Python
  (stdlib ``uuid.uuid5`` for the entity chain — an ORACLE INDEPENDENT
  of our own uuid5_py — plus the documented clj-uuid payload encoding
  for cmd ids), with one hardcoded non-ASCII uuid5 golden so the
  algorithm can never drift silently.

Reference anchors: id derivation ``import_clinical_data.clj:267,229,
187,157,128,113``; cmd-id hashing ``:288-289`` (UTF-8 name bytes via
clj-uuid, ``util.clj:32-43``).
"""

from __future__ import annotations

import uuid as _uuid

import duckdb
import pytest
from pyspark.sql import functions as F

from lens_sds_batch_spark.functions.keys import NIL_UUID, uuid5_py
from lens_sds_batch_spark.oracle import command_selects, odm_resolution_ctes
from lens_sds_batch_spark.plans.commands import generate_commands
from lens_sds_batch_spark.plans.odm import BATCH_CMD_ID, SUB, OdmTables

FILE_OID_U = "файл-β.xml"

# one literal golden: stdlib uuid5(nil, "研究-Ω") — computed once with
# CPython's uuid module, hardcoded so neither our Spark expression nor
# uuid5_py can drift without this line going red
GOLDEN_STUDY_UUID5 = "54bdce80-69a8-5f06-9ef3-1d86a22624c2"

# (study_oid, subject_key, tx) — all verbs, NULL inheritance, a removed
# subject whose children must be pruned
_SUBJECTS = [
    ("研究-Ω", "пациент-1", None),
    ("研究-Ω", "subjekt-ß", "upsert"),
    ("研究-Ω", "supprimé-é", "remove"),
    ("étude-β", "名前-😀", "update"),
    ("étude-β", "açaí-5", "insert"),
]
_STUDY_EVENTS = [
    ("研究-Ω", "пациент-1", "визит-①", None),
    ("研究-Ω", "пациент-1", "訪問-2", "remove"),
    ("研究-Ω", "subjekt-ß", "visite-à", "upsert"),
    ("研究-Ω", "supprimé-é", "SE-x", None),  # parent removed: pruned
    ("étude-β", "名前-😀", "ВИЗИТ-3", None),
    ("étude-β", "açaí-5", "εξέταση-4", "update"),
]
_FORMS = [
    ("研究-Ω", "пациент-1", "визит-①", "形式-1", None),
    ("研究-Ω", "пациент-1", "визит-①", "füllen-2", "remove"),
    ("研究-Ω", "пациент-1", "訪問-2", "FM-x", None),  # parent removed
    ("研究-Ω", "subjekt-ß", "visite-à", "форма-3", "upsert"),
    ("étude-β", "名前-😀", "ВИЗИТ-3", "φόρμα-4", None),
    ("étude-β", "açaí-5", "εξέταση-4", "φόρμα-5", None),
]
_ITEM_GROUPS = [
    ("研究-Ω", "пациент-1", "визит-①", "形式-1", "グループ-α", None),
    ("研究-Ω", "пациент-1", "визит-①", "形式-1", "组-β", "update"),
    ("研究-Ω", "subjekt-ß", "visite-à", "форма-3", "groupe-γ", None),
    ("étude-β", "名前-😀", "ВИЗИТ-3", "φόρμα-4", "グループ-α", None),
    ("étude-β", "açaí-5", "εξέταση-4", "φόρμα-5", "grupo-δ", None),
]
_ITEMS = [
    ("研究-Ω", "пациент-1", "визит-①", "形式-1", "グループ-α",
     "項目-温度", None, "string", "värde-µ-😀"),
    ("研究-Ω", "пациент-1", "визит-①", "形式-1", "グループ-α",
     "пункт-2", "update", "integer", "42"),
    ("研究-Ω", "пациент-1", "визит-①", "形式-1", "组-β",
     "στοιχείο-3", "remove", "string", "ß-straße"),
    ("研究-Ω", "subjekt-ß", "visite-à", "форма-3", "groupe-γ",
     "item-ascii", "upsert", "float", "3.14"),
    ("étude-β", "名前-😀", "ВИЗИТ-3", "φόρμα-4", "グループ-α",
     "пункт-2", None, "string", "日本語テキスト"),
    ("étude-β", "açaí-5", "εξέταση-4", "φόρμα-5", "grupo-δ",
     "項目-温度", None, "string", "emoji 🚀 value"),
]

_LEVELS = ("subjects", "study_events", "forms", "item_groups", "items")


def _write_crafted(spark, d: str) -> None:
    fo = FILE_OID_U
    frames = {
        "subjects": spark.createDataFrame(
            [(fo, *r) for r in _SUBJECTS],
            "file_oid string, study_oid string, subject_key string, tx_type string",
        ),
        "study_events": spark.createDataFrame(
            [(fo, *r) for r in _STUDY_EVENTS],
            "file_oid string, study_oid string, subject_key string, "
            "study_event_oid string, tx_type string",
        ),
        "forms": spark.createDataFrame(
            [(fo, *r) for r in _FORMS],
            "file_oid string, study_oid string, subject_key string, "
            "study_event_oid string, form_oid string, tx_type string",
        ),
        "item_groups": spark.createDataFrame(
            [(fo, *r) for r in _ITEM_GROUPS],
            "file_oid string, study_oid string, subject_key string, "
            "study_event_oid string, form_oid string, item_group_oid string, "
            "tx_type string",
        ),
        "items": spark.createDataFrame(
            [(fo, s, k, se, fm, ig, io, tx, dt, vc) for
             (s, k, se, fm, ig, io, tx, dt, vc) in _ITEMS],
            "file_oid string, study_oid string, subject_key string, "
            "study_event_oid string, form_oid string, item_group_oid string, "
            "item_oid string, tx_type string, data_type string, "
            "value_canon string",
        ),
    }
    for name, df in frames.items():
        df.coalesce(1).write.mode("overwrite").parquet(f"{d}/{name}.parquet")


def _load_odm(spark, d: str) -> OdmTables:
    t = {n: spark.read.parquet(f"{d}/{n}.parquet") for n in _LEVELS}
    files = spark.createDataFrame([(FILE_OID_U,)], "file_oid string")
    return OdmTables(files, t["subjects"], t["study_events"], t["forms"],
                     t["item_groups"], t["items"])


def test_unicode_odm_commands_md5_oracle_parity(spark, tmp_path):
    """generate_commands(md5) over the multi-byte tree vs the gate
    oracle's resolution/id/command SQL on the SAME crafted tables,
    through the real gate comparator."""
    from tools.drive_driver import compare_one

    d = str(tmp_path)
    _write_crafted(spark, d)

    con = duckdb.connect()
    for n in _LEVELS:
        con.execute(
            f"CREATE VIEW {n} AS SELECT * FROM '{d}/{n}.parquet/*.parquet'"
        )
    sql = (
        "WITH "
        + odm_resolution_ctes(ids=True)
        + "\n"
        + "\nUNION ALL\n".join(command_selects())
    )

    def fn(spark, sf_dir):
        return generate_commands(
            _load_odm(spark, sf_dir), BATCH_CMD_ID, SUB, persist=False,
            flavor="md5",
        )

    # vacuity guard (compare_one passes trivially on 0 == 0 rows): the
    # crafted tree must actually produce a multi-level command fan-out
    n = fn(spark, d).count()
    assert n >= 15, f"crafted tree produced only {n} commands"
    assert compare_one(con, spark, "odm_unicode_md5", fn, sql, sf_dir=d)


# param-name sets per entity for the sha1 payload reconstruction
_UUID_PARAM_OF = {
    "subject": "study-id",
    "study-event": "subject-id",
    "form": "study-event-id",
    "item-group": "form-id",
}
_OID_COL_OF = {
    "subject": "subject_key",
    "study-event": "study_event_oid",
    "form": "form_oid",
    "item-group": "item_group_oid",
}


def _sha1_cmd_id_model(row) -> str:
    """Pure-Python twin of plans/commands._payload(flavor='sha1') +
    uuid5 — the clj-uuid byte encoding: ':kw' UTF-8, uuid params as 16
    raw bytes, strings as UTF-8."""
    verb_entity = row["name"].split("/", 1)[1]
    verb, entity = verb_entity.split("-", 1)
    if entity == "item":
        if verb == "update":
            params = {
                "data-type": row["data_type"],
                "item-id": ("uuid", row["item_id"]),
                "value": row["value_canon"],
            }
        elif verb == "remove":
            params = {
                "item-group-id": ("uuid", row["parent_id"]),
                "item-oid": row["item_oid"],
            }
        else:
            params = {
                "item-group-id": ("uuid", row["parent_id"]),
                "item-oid": row["item_oid"],
                "data-type": row["data_type"],
                "value": row["value_canon"],
            }
    else:
        params = {
            _UUID_PARAM_OF[entity]: ("uuid", row["parent_id"]),
            _OID_COL_OF[entity]: row[_OID_COL_OF[entity]],
        }
        # param KEY for the oid follows the command vocabulary
        # (subject-key / study-event-oid / ... with dashes)
        oid_key = _OID_COL_OF[entity].replace("_", "-")
        params[oid_key] = params.pop(_OID_COL_OF[entity])
    params["file-oid"] = row["file_oid"]
    payload = (":" + row["name"]).encode("utf-8")
    for k in sorted(params):
        payload += (":" + k).encode("utf-8")
        v = params[k]
        if isinstance(v, tuple):
            payload += _uuid.UUID(v[1]).bytes
        else:
            payload += str(v).encode("utf-8")
    return uuid5_py(BATCH_CMD_ID, [payload])


def test_unicode_odm_commands_sha1_python_oracle(spark, tmp_path):
    """generate_commands(sha1) over the multi-byte tree: every entity
    id re-derived via STDLIB uuid.uuid5 (independent oracle) and every
    cmd_id via the documented clj-uuid payload model; one hardcoded
    non-ASCII golden pins the algorithm itself."""
    d = str(tmp_path)
    _write_crafted(spark, d)

    # --- the hardcoded golden, three ways ---
    assert (
        str(_uuid.uuid5(_uuid.UUID(NIL_UUID), "研究-Ω")) == GOLDEN_STUDY_UUID5
    )
    assert uuid5_py(NIL_UUID, ["研究-Ω"]) == GOLDEN_STUDY_UUID5
    from lens_sds_batch_spark.functions.keys import uuid5_col

    got = spark.range(1).select(
        uuid5_col(NIL_UUID, [F.lit("研究-Ω")]).alias("u")
    ).first()["u"]
    assert got == GOLDEN_STUDY_UUID5

    rows = generate_commands(
        _load_odm(spark, d), BATCH_CMD_ID, SUB, persist=False, flavor="sha1"
    ).collect()
    assert rows, "no commands generated"

    # --- stdlib uuid5 entity chain (independent of uuid5_py) ---
    def chain(*parts):
        u = _uuid.UUID(NIL_UUID)
        for p in parts:
            u = _uuid.uuid5(u, p)
        return str(u)

    by_key = {}
    for r in rows:
        k = (r["name"], r["study_oid"], r["subject_key"], r["study_event_oid"],
             r["form_oid"], r["item_group_oid"], r["item_oid"])
        by_key[k] = r

    # insert-subject for пациент-1: parent_id = study id
    r = by_key[("odm-import/insert-subject", "研究-Ω", "пациент-1",
                 None, None, None, None)]
    assert r["parent_id"] == chain("研究-Ω") == GOLDEN_STUDY_UUID5
    # upsert-study-event visite-à: parent_id = subject id of subjekt-ß
    r = by_key[("odm-import/upsert-study-event", "研究-Ω", "subjekt-ß",
                 "visite-à", None, None, None)]
    assert r["parent_id"] == chain("研究-Ω", "subjekt-ß")
    # upsert-form форма-3: parent_id = study-event id
    r = by_key[("odm-import/upsert-form", "研究-Ω", "subjekt-ß",
                 "visite-à", "форма-3", None, None)]
    assert r["parent_id"] == chain("研究-Ω", "subjekt-ß", "visite-à")
    # insert-item-group グループ-α under the update-subject's tree must
    # NOT exist as insert (rtx inherited update at form level → no
    # interior command), but the emoji subject's ig does exist:
    r = by_key[("odm-import/insert-item-group", "研究-Ω", "пациент-1",
                 "визит-①", "形式-1", "グループ-α", None)]
    assert r["parent_id"] == chain("研究-Ω", "пациент-1", "визит-①", "形式-1")
    # insert-item 項目-温度: parent_id = item-group id (5-deep chain)
    r = by_key[("odm-import/insert-item", "研究-Ω", "пациент-1",
                 "визит-①", "形式-1", "グループ-α", "項目-温度")]
    assert r["parent_id"] == chain(
        "研究-Ω", "пациент-1", "визит-①", "形式-1", "グループ-α"
    )
    # update-item пункт-2 carries item_id = 6-deep chain
    r = by_key[("odm-import/update-item", "研究-Ω", "пациент-1",
                 "визит-①", "形式-1", "グループ-α", "пункт-2")]
    assert r["item_id"] == chain(
        "研究-Ω", "пациент-1", "визит-①", "形式-1", "グループ-α", "пункт-2"
    )

    # --- pruning semantics on the multi-byte tree ---
    names = sorted(r["name"] for r in rows)
    assert "odm-import/remove-subject" in names
    # removed subject's children never appear
    assert not any(r["study_event_oid"] == "SE-x" for r in rows)
    assert not any(r["form_oid"] == "FM-x" for r in rows)
    # interior update emits no command
    assert not any(r["name"] == "odm-import/update-subject" for r in rows)
    assert not any(
        r["name"] == "odm-import/insert-subject"
        and r["subject_key"] == "名前-😀" for r in rows
    )

    # --- every cmd_id re-derived through the clj-uuid byte model ---
    for r in rows:
        assert r["cmd_id"] == _sha1_cmd_id_model(r), (
            f"cmd_id mismatch for {r['name']} "
            f"({r['study_oid']}/{r['subject_key']})"
        )
