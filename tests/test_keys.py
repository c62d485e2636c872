"""Golden pins + property tests for deterministic key generation.

Mirrors the reference's test strategy (SURVEY.md §5):
``gen-cmd-id-test`` golden pin, order-insensitivity, and the two
1000-case distinctness defspecs
(``test/lens/import_clinical_data_test.clj:261-280``).
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from lens_sds_batch_spark.functions import keys
from lens_sds_batch_spark.functions.keys import (
    NIL_UUID,
    Kw,
    cmd_id_col,
    duck_cmd_id_sql,
    duck_uuid3_sql,
    java_uuid_from_string,
    uuid3_str_col,
    uuid3_str_py,
    uuid5_col,
    uuid5_py,
)

# The reference test namespace (note: malformed 13-hex-digit last group,
# accepted by Java's lenient UUID.fromString — we reproduce that).
REF_NS_LITERAL = "2a302e1b-3cb4-425e-bca9-db7831d81e69d"
REF_GOLDEN = "75e752d9-c2bf-53dc-82dd-97f4c05363ec"


def test_java_lenient_uuid_parse():
    assert java_uuid_from_string(REF_NS_LITERAL) == "2a302e1b-3cb4-425e-bcad-b7831d81e69d"


def test_uuid5_reference_golden_pin_python():
    """Byte-exact parity with the reference's pinned gen-cmd-id value."""
    ns = java_uuid_from_string(REF_NS_LITERAL)
    parts = [Kw("odm-import/insert-subject"), Kw("study-id"), "S1", Kw("subject-key"), "SUB1"]
    assert uuid5_py(ns, parts) == REF_GOLDEN


def test_uuid5_reference_golden_pin_spark(spark):
    """The Catalyst column expression produces the same golden value."""
    ns = java_uuid_from_string(REF_NS_LITERAL)
    df = spark.range(1).select(
        uuid5_col(
            ns,
            [Kw("odm-import/insert-subject"), Kw("study-id"), F.lit("S1"), Kw("subject-key"), F.lit("SUB1")],
        ).alias("id")
    )
    assert df.collect()[0]["id"] == REF_GOLDEN


def test_uuid5_is_valid_rfc4122(spark):
    row = spark.range(1).select(uuid5_col(NIL_UUID, ["hello"]).alias("id")).collect()[0]
    import uuid as _uuid

    u = _uuid.UUID(row["id"])
    assert u.version == 5
    assert u.variant == _uuid.RFC_4122


def test_uuid3_spark_python_duckdb_agree(spark):
    """The oracle flavor must agree across all three runtimes."""
    parts = [":odm-import/insert-subject", ":study-id", "S1"]
    py = uuid3_str_py(NIL_UUID, parts)
    sp = (
        spark.range(1)
        .select(uuid3_str_col(NIL_UUID, [F.lit(p) for p in parts]).alias("id"))
        .collect()[0]["id"]
    )
    duck_expr = duck_uuid3_sql(f"'{NIL_UUID}'", [f"'{p}'" for p in parts])
    dk = duckdb.sql(f"SELECT {duck_expr} AS id").fetchone()[0]
    assert py == sp == dk


def test_cmd_id_order_insensitive(spark):
    """Params sorted by key ⇒ insertion order irrelevant (reference
    ``gen-cmd-id-test`` order testing)."""
    a = cmd_id_col(NIL_UUID, "foo", {"a": F.lit("1"), "b": F.lit("2")})
    b = cmd_id_col(NIL_UUID, "foo", {"b": F.lit("2"), "a": F.lit("1")})
    row = spark.range(1).select(a.alias("a"), b.alias("b")).collect()[0]
    assert row["a"] == row["b"]


def test_cmd_id_duckdb_parity(spark):
    sp = (
        spark.range(1)
        .select(cmd_id_col(NIL_UUID, "foo", {"a": F.lit("1"), "b": F.lit("2")}).alias("id"))
        .collect()[0]["id"]
    )
    dk = duckdb.sql(
        "SELECT " + duck_cmd_id_sql(f"'{NIL_UUID}'", "foo", {"a": "'1'", "b": "'2'"}) + " AS id"
    ).fetchone()[0]
    assert sp == dk


@settings(max_examples=200, deadline=None)
@given(st.lists(st.text(min_size=0, max_size=30), min_size=2, max_size=2, unique=True))
def test_distinct_names_distinct_ids(names):
    """reference defspec gen-cmd-id-name-distinct (1000 cases)."""
    a, b = names
    assert uuid5_py(NIL_UUID, [Kw(a)]) != uuid5_py(NIL_UUID, [Kw(b)])
    assert uuid3_str_py(NIL_UUID, [a]) != uuid3_str_py(NIL_UUID, [b])


@settings(max_examples=200, deadline=None)
@given(st.lists(st.text(min_size=0, max_size=30), min_size=2, max_size=2, unique=True))
def test_distinct_param_values_distinct_ids(vals):
    """reference defspec gen-cmd-id-param-distinct (1000 cases)."""
    a, b = vals
    pa = [Kw("foo"), Kw("bar"), a]
    pb = [Kw("foo"), Kw("bar"), b]
    assert uuid5_py(NIL_UUID, pa) != uuid5_py(NIL_UUID, pb)


def test_entity_key_chain():
    """SURVEY §1.1 derivation chain: each level namespaced by parent id."""
    study = uuid5_py(NIL_UUID, ["S1"])
    subject = uuid5_py(study, ["SUB1"])
    se = uuid5_py(subject, ["SE1"])
    form = uuid5_py(se, ["F1"])
    ig = uuid5_py(form, ["IG1"])
    item = uuid5_py(ig, ["I1"])
    assert len({study, subject, se, form, ig, item}) == 6
    # stability pin (regression guard for our own algorithm)
    assert study == uuid5_py(NIL_UUID, ["S1"])


def test_uuid_columns_are_non_nullable(spark):
    """Nullability contract pin (r5): the uuid formatters must stay
    NON-nullable.  A nullable uuid column makes every downstream join
    push an isnotnull(<whole uuid expression>) Filter below the
    projection, re-evaluating the md5/sha1 per row with no CSE across
    the Filter/Project boundary — measured correlate_first_event
    4.7s → 6.9s at sf0.1 when this regressed.  If this pin fails, read
    functions/keys._fmt_uuid's docstring before 'fixing' it."""
    from pyspark.sql import functions as F

    from lens_sds_batch_spark.functions.keys import NIL_UUID, uuid3_str_col, uuid5_col

    df = spark.createDataFrame([("x",)], "v string").select(
        uuid3_str_col(NIL_UUID, [F.col("v")]).alias("u3"),
        uuid5_col(NIL_UUID, [F.col("v").cast("binary")]).alias("u5"),
    )
    assert not df.schema["u3"].nullable, "uuid3_str_col became nullable (plan-poisoning)"
    assert not df.schema["u5"].nullable, "uuid5_col became nullable (plan-poisoning)"


def test_fast_path_equals_python_and_fallback_adversarial(spark):
    """r6 guard for the single-parse SQL fast path: over adversarial
    literal strings (quotes, backslashes, newlines, unicode, SQL-ish
    fragments), the fast path (str parts / bare-column parts) must
    equal BOTH the Python golden implementation and the composed-Column
    fallback (forced via a non-bare Column part).  An escaping bug in
    _esc / _to_str_sql shows up here before it can corrupt ids."""
    adversarial = [
        "plain",
        "",
        "it's",
        'a"b',
        "back\\slash",
        "semi;colon--comment",
        "line\nbreak",
        "unié中",
        "' OR 1=1 --",
        ":kw/with-colons",
        "  spaces  ",
    ]
    df = spark.createDataFrame([(s,) for s in adversarial], "v string")
    out = df.select(
        "v",
        # fast path: literal str part
        *[
            uuid3_str_col(NIL_UUID, [s]).alias(f"lit3_{i}")
            for i, s in enumerate(adversarial)
        ],
        # fast path: bare column part
        uuid3_str_col(NIL_UUID, [F.col("v")]).alias("col3"),
        # forced fallback: non-bare column part (concat breaks bareness)
        uuid3_str_col(NIL_UUID, [F.concat(F.col("v"), F.lit(""))]).alias("fb3"),
        uuid5_col(NIL_UUID, [F.col("v").cast("binary")]).alias("col5"),
        uuid5_col(NIL_UUID, [F.concat(F.col("v"), F.lit("")).cast("binary")]).alias("fb5"),
    ).collect()
    by_v = {r["v"]: r for r in out}
    for i, s in enumerate(adversarial):
        py3 = uuid3_str_py(NIL_UUID, [s])
        py5 = uuid5_py(NIL_UUID, [s])
        r = by_v[s]
        # literal fast path == python golden (same value in every row)
        assert out[0][f"lit3_{i}"] == py3, f"literal fast path broke on {s!r}"
        # column fast path == python golden == forced fallback
        assert r["col3"] == py3 == r["fb3"], f"column path broke on {s!r}"
        assert r["col5"] == py5 == r["fb5"], f"uuid5 path broke on {s!r}"


def test_fast_path_keyword_and_reserved_column_names(spark):
    """r6 review: a column literally named current_date must hash the
    COLUMN (backtick-quoted), not resolve to the zero-arg function —
    and a reserved word like `order` must not ParseException."""
    df = spark.createDataFrame(
        [("a", "b")], "current_date string, order string"
    )
    row = df.select(
        uuid3_str_col(NIL_UUID, [F.col("current_date")]).alias("u1"),
        uuid3_str_col(NIL_UUID, [F.col("order")]).alias("u2"),
    ).first()
    assert row["u1"] == uuid3_str_py(NIL_UUID, ["a"])
    assert row["u2"] == uuid3_str_py(NIL_UUID, ["b"])


def test_fast_path_literal_columns_and_bound_columns(spark):
    """r6 high-effort review: Column literals that STRINGIFY like
    identifiers (lit(True) -> 'true', lit(None) -> 'NULL') must route
    to the composed fallback, and a dataframe-BOUND column (a['v']
    after a join with an ambiguous free name) must keep its binding
    instead of degrading to name resolution."""
    # boolean literal: composed path hashes the string 'true'
    row = spark.range(1).select(
        uuid3_str_col(NIL_UUID, [F.lit(True)]).alias("u"),
    ).first()
    assert row["u"] == uuid3_str_py(NIL_UUID, ["true"])

    # bound column through an ambiguous join: must hash side a's value
    a = spark.createDataFrame([(1, "va")], "k int, v string")
    b = spark.createDataFrame([(1, "vb")], "k int, v string")
    j = a.join(b, "k")
    got = j.select(uuid3_str_col(NIL_UUID, [a["v"]]).alias("u")).first()["u"]
    assert got == uuid3_str_py(NIL_UUID, ["va"])


def test_uuid_ns_string_is_escaped_in_fast_path(spark):
    """A quote-bearing ns string must hash the literal characters, not
    parse as SQL concat — fast path and Python golden must agree."""
    ns = "a'||'b"
    got = spark.range(1).select(
        uuid3_str_col(ns, ["x"]).alias("u")
    ).first()["u"]
    # the engine lowercases + strips dashes from ns before hashing
    import hashlib

    payload = ns.replace("-", "").lower() + "x"
    h = hashlib.md5(payload.encode()).hexdigest()
    from lens_sds_batch_spark.functions.keys import _VARIANT_MAP

    expect = f"{h[0:8]}-{h[8:12]}-3{h[13:16]}-{_VARIANT_MAP[int(h[16],16)]}{h[17:20]}-{h[20:32]}"
    assert got == expect


def test_uuid5_uuidbytes_quote_value_fast_equals_fallback(spark):
    """r6 review: a quote-bearing UuidBytes value must not parse as SQL
    concat in the fast path — both paths unhex the non-hex literal to a
    NULL payload, which since r7 RAISES under the default guard
    (escaping bug would instead silently produce a VALID-looking id);
    under the explicit waiver both paths format the identical
    empty-string degenerate."""
    from lens_sds_batch_spark.functions.keys import UuidBytes

    bad = UuidBytes("a'||'b")
    for ns in (NIL_UUID, F.concat(F.lit(NIL_UUID), F.lit(""))):  # fast, fallback
        with pytest.raises(Exception, match="NULL id payload"):
            spark.range(1).select(uuid5_col(ns, [bad]).alias("u")).first()
    row = spark.range(1).select(
        uuid5_col(NIL_UUID, [bad], on_null="empty").alias("fast"),
        # force the composed fallback with a bound-expression ns
        uuid5_col(
            F.concat(F.lit(NIL_UUID), F.lit("")), [bad], on_null="empty"
        ).alias("fb"),
    ).first()
    assert row["fast"] == row["fb"] == ""


def test_null_payload_raises_by_default_and_waives_explicitly(spark):
    """VERDICT r6 #5: guard_payload is the DEFAULT formatter path — a
    NULL part must RAISE at execution (both fast-SQL and composed
    fallback), never silently collapse to the empty-string degenerate
    id; on_null="empty" is the explicit waiver that restores the old
    behavior for pre-guarded callers."""
    df = spark.createDataFrame([("x",), (None,)], "v string")

    for mk in (
        lambda d: d.select(uuid3_str_col(NIL_UUID, [F.col("v")]).alias("u")),
        # non-bare part forces the composed-Column fallback path
        lambda d: d.select(
            uuid3_str_col(NIL_UUID, [F.upper(F.col("v"))]).alias("u")
        ),
        lambda d: d.select(
            uuid5_col(NIL_UUID, [F.col("v").cast("binary")]).alias("u")
        ),
    ):
        with pytest.raises(Exception, match="NULL id payload"):
            mk(df).collect()
        # guard is short-circuited: non-null rows alone pass unchanged
        ok = mk(df.where(F.col("v").isNotNull())).collect()
        assert len(ok) == 1 and len(ok[0]["u"]) == 36

    # explicit waiver: legacy empty-payload collapse, non-nullable out
    waived = df.select(
        uuid3_str_col(NIL_UUID, [F.col("v")], on_null="empty").alias("u")
    ).collect()
    assert len(waived) == 2  # no raise
    # the NULL row collapses to the degenerate empty string (concat
    # null-propagates the payload; concat_ws then skips every NULL
    # fragment) — exactly the legacy behavior the waiver preserves
    assert sorted(len(r["u"]) for r in waived) == [0, 36]

    with pytest.raises(ValueError, match="on_null"):
        uuid3_str_col(NIL_UUID, ["a"], on_null="bogus")


def test_null_guard_does_not_change_nullability_or_goldens(spark):
    """The default guard must not flip the non-nullability contract
    (test_uuid_columns_are_non_nullable) nor any golden value."""
    df = spark.createDataFrame([("S1",)], "v string").select(
        uuid3_str_col(NIL_UUID, [F.col("v")]).alias("u3"),
        uuid5_col(NIL_UUID, [F.col("v").cast("binary")]).alias("u5"),
    )
    assert not df.schema["u3"].nullable and not df.schema["u5"].nullable
    row = df.collect()[0]
    assert row["u3"] == uuid3_str_py(NIL_UUID, ["S1"])
    assert row["u5"] == uuid5_py(NIL_UUID, ["S1"])
