"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship ODM→commands pipeline on sf0.001;
``queries()``/``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 with its DuckDB twin for the driver's hash-compare.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from lens_sds_batch_spark import oracle
from lens_sds_batch_spark.plans.commands import generate_commands
from lens_sds_batch_spark.plans.odm import BATCH_CMD_ID, SUB, derive_odm_resolved

SF_SMOKE = "/root/testdata/sf0.001"


def _odm_commands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fused flagship: join-free derivation (tx resolution + id chains
    per-row, chain hashes at lineitem grain before the EAV explode);
    row-identical to the generic normalized path — pinned by
    tests/test_odm_commands.py::test_fused_equals_generic."""
    odm = derive_odm_resolved(spark, sf_dir)
    return generate_commands(odm, BATCH_CMD_ID, SUB)


def _odm_commands_uuid5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True RFC-4122 UUIDv5 id flavor (reference byte-parity algebra).
    Rows-only check: this DuckDB has no sha1; correctness of the id
    algebra is golden-pinned in tests/test_keys.py instead."""
    odm = derive_odm_resolved(spark, sf_dir, flavor="sha1")
    return generate_commands(odm, BATCH_CMD_ID, SUB, flavor="sha1")


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
    }
    from lens_sds_batch_spark.operators import registry

    o.update(registry.oracle_queries())
    return o
