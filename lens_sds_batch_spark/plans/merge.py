"""LWW merge / upsert application (SURVEY.md §7.3 milestone 4).

The reference delegates actual store mutation to the downstream
transaction processor; for our engine to be queryable the command
stream must be *applicable*.  The portable pattern (no Delta needed):
union current+incoming → row_number over the key ordered by recency →
keep rank 1 → drop tombstones.  With Delta/Iceberg on the cluster this
becomes ``MERGE INTO``; the semantics below are identical.

At 100 TB: one shuffle on the merge key (same layout the downstream
queries want), map-side combinable, AQE-skew-safe.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def apply_lww(
    df: DataFrame,
    keys: list[str],
    order_cols: list[Column],
    is_delete: Column,
) -> DataFrame:
    """Keep the latest row per key (ordering = order_cols DESC chain),
    dropping keys whose latest row is a tombstone."""
    w = Window.partitionBy(*keys).orderBy(*[c.desc() for c in order_cols])
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") == 1)
        .where(~is_delete)
        .drop("__rk")
    )
