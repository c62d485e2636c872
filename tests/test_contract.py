"""Driver-contract self-checks: registration consistency and the
external-session defense (cheap guards against future drift)."""

from __future__ import annotations

import __spark_entry__ as entry_mod


def test_registry_consistency():
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    # every oracle belongs to a registered query
    assert set(oracles) <= set(qs)
    # flagship + uuid5 flavor registered; flagship oracle-paired
    assert "odm_commands" in oracles
    assert "odm_commands_uuid5" in qs and "odm_commands_uuid5" not in oracles
    # all builders are callables with the (spark, sf_dir) arity
    for name, fn in qs.items():
        assert callable(fn), name
    # no accidental duplicates between plans and operators
    assert len(qs) == len(set(qs))


def test_engine_confs_reassert_on_load(spark):
    """The driver hands us ITS session: loading any table must force the
    engine-critical runtime confs (UTC + nanosAsLong) even if the
    session was built without them."""
    from lens_sds_batch_spark.sources.parquet import load_events, load_table

    from .conftest import SF_SMOKE

    old_tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
        load_table(spark, SF_SMOKE, "orders")
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
        assert spark.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "true"
        # and the nanos table is actually readable again
        assert load_events(spark, SF_SMOKE).limit(1).count() == 1
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)
