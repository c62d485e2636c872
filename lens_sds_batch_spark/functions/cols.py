"""Column-name utilities shared by operators."""

from __future__ import annotations

from pyspark.sql import DataFrame


def temp_col_name(df: DataFrame, base: str) -> str:
    """A scratch-column name guaranteed absent from ``df``.

    Operators that bind an intermediate expression with ``withColumn``
    and drop it afterwards (the CaseWhen-CSE discipline, NOTES.md)
    would silently clobber and remove a caller's column of the same
    name — real for public operators like ``assign_cells`` that accept
    arbitrary frames (advisor r9).  Returns ``base`` when free, else
    ``base__2``, ``base__3``, ... (bounded by the frame's width, so the
    loop always terminates).
    """
    cols = set(df.columns)
    if base not in cols:
        return base
    i = 2
    while f"{base}__{i}" in cols:
        i += 1
    return f"{base}__{i}"
