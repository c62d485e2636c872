"""Empty-input totality sweep (r8): every registry query must DEGRADE,
not CRASH, when a table it reads has zero rows.

Why this matters at 100 TB: a daily pipeline routinely meets empty
inputs — a new tenant's first day, a partition whose upstream job
produced headers only, a filter that eliminated everything.  The
reference behaves the same way (an ODM file with no ClinicalData
children produces zero commands, not an exception —
``/root/reference/src/lens/import_clinical_data.clj`` walks whatever
tree is there).  A query that throws on empty input turns a quiet day
into a paged incident.

Contract pinned here, per query:

- executes end-to-end (``count()`` runs) on an all-empty scale dir, and
- returns either 0 rows or, for global aggregates, their documented
  1-row zero/NULL form — we assert only "no crash + sane row count",
  value semantics stay the oracle gate's job; EXCEPT
- ops whose semantics genuinely require data (a model fit) must raise
  LOUDLY with a recognizable message, not return garbage — those are
  listed in EXPECTED_RAISES with the reason.
"""

from __future__ import annotations

import os

import pytest

from tests.conftest import SF_SMOKE

# ops that cannot be meaningful on zero rows: they must RAISE a clear
# error instead of silently emitting nonsense
EXPECTED_RAISES = {
    # KMeans cannot fit on an empty sample; pyspark.ml raises.  The
    # IVF contract is "fit requires a non-empty corpus" — loud is right.
    "ivf_knn": "empty|requires nonempty|no rows|zero",
}


@pytest.fixture(scope="module")
def empty_sf_dir(spark, tmp_path_factory):
    """A scale-dir mirror where every table keeps its exact schema but
    has zero rows."""
    d = tmp_path_factory.mktemp("sf_empty")
    for f in os.listdir(SF_SMOKE):
        if not f.endswith(".parquet"):
            continue
        src = spark.read.parquet(f"{SF_SMOKE}/{f}")
        src.limit(0).write.parquet(f"{d}/{f}")
    return str(d)


def _registry():
    import __spark_entry__ as entry

    return entry.queries()


QUERY_NAMES = sorted(_registry().keys())


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_total_on_empty_inputs(spark, empty_sf_dir, name):
    fn = _registry()[name]
    if name in EXPECTED_RAISES:
        import re

        with pytest.raises(Exception) as ei:
            fn(spark, empty_sf_dir).count()
        assert re.search(EXPECTED_RAISES[name], str(ei.value), re.IGNORECASE), (
            f"{name} raised, but not the documented loud error: {ei.value}"
        )
        return
    df = fn(spark, empty_sf_dir)
    n = df.count()
    # global aggregates legally emit one (or a few) all-zero/NULL rows;
    # everything else must emit none.  Either way the bound is small —
    # a query fabricating rows from nothing is a bug this catches.
    assert n <= 60, f"{name} fabricated {n} rows from empty inputs"
