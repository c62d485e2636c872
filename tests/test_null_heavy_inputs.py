"""NULL-heavy input sweep (r8): every registry query must either run
(degrading per its documented policy) or raise ITS OWN loud,
recognizable guard when ~25% of every non-key column is NULL.

The companion of test_empty_inputs.py: a 100 TB corpus always carries
NULLs — optional fields, failed upstream extractions, schema-evolved
readers filling absent columns.  What this pins, per class:

- relational / text / dedup / curation ops: run and degrade (NULL keys
  drop out of inner joins, NULL text tokenizes to nothing, NULL
  embeddings drop from candidate sets).
- ivf_knn: EXCLUDES invalid embeddings from fit/assign/candidates (the
  FAISS policy; ragged dims still raise — structural corruption).
- media decode: NULL payloads become routable ``missing-payload``
  marker rows, never a job kill.
- odm_xml_ingest: NULL item values render as ABSENT elements (real
  ODM's "no value"), exercising the parser's absent-item path.
- odm_commands / odm_commands_uuid5: RAISE the designed id-payload
  guard — a NULL feeding an id derivation would silently collapse
  distinct ids into one degenerate value, which is corruption, not
  degradation.  The guard message names the fix and the waiver.
"""

from __future__ import annotations

import os
import re

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE

# columns that keep their values: identity/join keys, whose nulling
# tests referential breakage rather than optional-field tolerance
KEEP = {
    "doc_id", "vec_id", "event_id", "l_orderkey", "o_orderkey",
    "c_custkey", "s_suppkey", "p_partkey", "n_nationkey", "r_regionkey",
    "l_linenumber",
}

# queries whose DOCUMENTED contract is a loud guard on NULL-fed inputs,
# with the message marker that proves it's the designed error (not a
# random executor crash)
EXPECTED_RAISES = {
    "odm_commands": r"NULL id payload",
    "odm_commands_uuid5": r"NULL id payload",
}


@pytest.fixture(scope="module")
def null_heavy_dir(spark, tmp_path_factory):
    """sf mirror with a deterministic ~25% of every non-key column
    NULLed (hash of first column + column name picks the victims, so
    the sweep is reproducible)."""
    d = tmp_path_factory.mktemp("sf_nullheavy")
    for f in os.listdir(SF_SMOKE):
        if not f.endswith(".parquet"):
            continue
        df = spark.read.parquet(f"{SF_SMOKE}/{f}")
        first = df.columns[0]
        cols = [
            F.col(c.name)
            if c.name in KEEP
            else F.when(
                F.pmod(F.xxhash64(F.col(first), F.lit(c.name)), F.lit(4)) == 0,
                F.lit(None).cast(c.dataType),
            ).otherwise(F.col(c.name)).alias(c.name)
            for c in df.schema.fields
        ]
        df.select(*cols).write.parquet(f"{d}/{f}")
    return str(d)


def _registry():
    import __spark_entry__ as entry

    return entry.queries()


QUERY_NAMES = sorted(_registry().keys())


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_tolerates_null_heavy_inputs(spark, null_heavy_dir, name):
    fn = _registry()[name]
    if name in EXPECTED_RAISES:
        with pytest.raises(Exception) as ei:
            fn(spark, null_heavy_dir).count()
        assert re.search(EXPECTED_RAISES[name], str(ei.value)), (
            f"{name} raised, but not its documented guard: {ei.value}"
        )
        return
    # must execute; row counts legitimately shift with nulled inputs,
    # so the only value claim here is "finite and not fabricated"
    n = fn(spark, null_heavy_dir).count()
    assert n >= 0
