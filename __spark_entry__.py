"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship ODM→commands pipeline on sf0.001;
``queries()``/``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 with its DuckDB twin for the driver's hash-compare.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from lens_sds_batch_spark import oracle
from lens_sds_batch_spark.plans.odm import BATCH_CMD_ID, SUB, fused_commands

SF_SMOKE = "/root/testdata/sf0.001"


def _odm_commands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fused flagship: join-free derivation (tx resolution + id chains
    per-row, chain hashes at lineitem grain before the EAV explode) +
    single-pass command generation (r15: forms/item-groups/items emitted
    in ONE scan of the form-grain frontier — no persisted 3-consumer
    fan); row-identical to the generic normalized path — pinned by
    tests/test_odm_commands.py::test_fused_equals_generic."""
    return fused_commands(spark, sf_dir, BATCH_CMD_ID, SUB)


def _odm_commands_uuid5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True RFC-4122 UUIDv5 id flavor (reference byte-parity algebra),
    oracle-PAIRED on everything this DuckDB can check (r5; was
    rows-only): every NON-hash column is hash-compared against the
    md5-flavor oracle (the two flavors differ only in the id
    derivation), and the sha1 ids themselves — which DuckDB v1.0
    cannot compute — are checked per-row for RFC-4122 well-formedness
    (length, version nibble '5', variant nibble) as flags the oracle
    pins to literal 1s.  The id BYTES remain golden-pinned in
    tests/test_keys.py (including the reference's own
    75e752d9-… vector)."""
    from pyspark.sql import functions as F

    cmds = fused_commands(spark, sf_dir, BATCH_CMD_ID, SUB, flavor="sha1")

    def wf(c):
        return (
            (F.length(c) == 36)
            & (F.substring(c, 15, 1) == "5")
            & F.substring(c, 20, 1).isin(*"89ab")
        )

    flag = (
        wf(F.col("cmd_id"))
        & wf(F.col("parent_id"))
        & (F.col("item_id").isNull() | wf(F.col("item_id")))
    )
    return cmds.select(
        "name", "sub", "file_oid", "study_oid", "subject_key", "study_event_oid",
        "form_oid", "item_group_oid", "item_oid", "data_type", "value_canon",
        flag.cast("int").alias("ids_wellformed"),
    )


def _odm_uuid5_oracle_sql() -> str:
    # hash-free oracle: same command rows minus the sha1 id columns,
    # built WITHOUT evaluating any md5 chain (the *_ids CTEs are never
    # referenced) — ~20x cheaper than wrapping odm_commands_sql()
    return oracle.odm_commands_nohash_sql()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: derived ODM tree → tx resolution → deterministic-id
    command set (reference A9/A10/A15/A17/A18/A19 in one pipeline)."""
    return _odm_commands(spark, SF_SMOKE)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {
        "odm_commands": _odm_commands,
        "odm_commands_uuid5": _odm_commands_uuid5,
    }
    from lens_sds_batch_spark.operators import registry

    q.update(registry.spark_queries())
    return q


def oracle_sql() -> dict[str, str]:
    o = {
        "odm_commands": oracle.odm_commands_sql(),
        "odm_commands_uuid5": _odm_uuid5_oracle_sql(),
    }
    from lens_sds_batch_spark.operators import registry

    o.update(registry.oracle_queries())
    return o
