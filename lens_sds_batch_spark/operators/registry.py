"""Aggregates every operator module's QUERIES dict into the
``__spark_entry__`` contract (queries() + oracle_sql()).

Each module exports ``QUERIES: dict[name, (builder, duck_sql | None)]``;
a None SQL means the op is not SQL-expressible and gets the driver's
weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _modules():
    from . import cdc, dedup, multimodal, relational, similarity, textops

    return [relational, cdc, dedup, similarity, textops, multimodal]


def all_queries() -> dict[str, tuple]:
    out: dict[str, tuple] = {}
    for m in _modules():
        for name, pair in m.QUERIES.items():
            if name in out:
                raise ValueError(f"duplicate query name: {name}")
            out[name] = pair
    return out


def spark_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: builder for name, (builder, _) in all_queries().items()}


def oracle_queries() -> dict[str, str]:
    return {name: sql for name, (_, sql) in all_queries().items() if sql is not None}
