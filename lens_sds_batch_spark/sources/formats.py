"""CSV / JSON-lines table readers (SURVEY §2 B1: the reference's only
source is a blob store + XML parse — ``src/lens/file_storage.clj:12-17``
— but the capability-equivalent engine's B1 row promises the standard
Spark text-format surface next to parquet).

Design, mirroring the kafka seam's dead-letter contract
(``streaming/pipeline.parse_event_records``):

- Schemas are EXPLICIT.  Inference (``inferSchema``/``samplingRatio``)
  re-reads the data once just to guess types, is non-deterministic
  under sampling, and at 100 TB doubles the scan — a production table
  has a contract schema; pass it.
- PERMISSIVE + ``columnNameOfCorruptRecord``: a malformed line must not
  abort a 100 TB job (FAILFAST) nor vanish (DROPMALFORMED); it lands
  typed-NULL with the raw line preserved in ``_corrupt`` so the caller
  can route it through ``requeue_sink``'s dead path, counted — the
  same 3-way totality argument as A22.
- The readers return the raw frame INCLUDING ``_corrupt``;
  :func:`split_corrupt` separates clean rows from evidence rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .parquet import ensure_engine_confs

CORRUPT_COL = "_corrupt"


def _reader(spark: SparkSession, fmt: str, schema: str, options: dict | None):
    ensure_engine_confs(spark)
    reader = (
        spark.read.format(fmt)
        .schema(schema + f", {CORRUPT_COL} string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
    )
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    return reader


def read_csv_table(
    spark: SparkSession,
    path: str,
    schema: str,
    header: bool = True,
    options: dict | None = None,
) -> DataFrame:
    """CSV scan with an explicit schema and corrupt-line capture.

    ``schema`` is a DDL string WITHOUT the corrupt column (added here).
    Timestamps use ``timestampFormat`` ISO-8601 default; override via
    ``options``.
    """
    r = _reader(spark, "csv", schema, options).option("header", str(header).lower())
    return r.load(path)


def read_json_table(
    spark: SparkSession,
    path: str,
    schema: str,
    options: dict | None = None,
) -> DataFrame:
    """JSON-lines scan with an explicit schema and corrupt-line capture."""
    return _reader(spark, "json", schema, options).load(path)


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, dead): clean rows lose the bookkeeping column; dead rows
    keep the raw line as evidence.  Total: every input row lands in
    exactly one side (NULL ``_corrupt`` == parsed clean).

    The input is persisted first: Spark DISALLOWS filtering a raw
    text-format scan on only the corrupt-record column
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN — column
    pruning would make the parse-failure signal itself unreliable), and
    its documented remedy is cache-or-save the parsed result.  Both
    returned frames share the one materialized scan, which is also what
    a 100 TB split wants — one pass over the raw bytes, two consumers.
    ``persist()`` marks the INPUT frame's plan, so the caller releases
    the cache by calling ``.unpersist()`` on the frame they passed in,
    once both outputs are consumed — long-lived sessions ingesting many
    tables through this seam should do so, or executor storage
    accumulates dead cached scans (one-shot jobs can let it age out)."""
    df = df.persist()
    clean = df.where(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    dead = df.where(F.col(CORRUPT_COL).isNotNull())
    return clean, dead
