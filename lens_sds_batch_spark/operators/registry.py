"""Aggregates every operator module's QUERIES dict into the
``__spark_entry__`` contract (queries() + oracle_sql()).

Each module exports ``QUERIES: dict[name, (builder, duck_sql | None)]``;
a None SQL means the op is not SQL-expressible and gets the driver's
weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


# The driver hash-checks only the FIRST 50 entries of queries() (2 of
# which are the entry-point flagship queries) — so the LLM-pipeline
# modules (dedup/similarity/textops/multimodal, the north-star mandate)
# register first, and the total registry is kept <= MAX_CHECKED - 2 by
# folding relational micro-queries into packs (see relational.py).
MAX_CHECKED = 50
ENTRY_QUERIES = 2  # odm_commands, odm_commands_uuid5 registered by __spark_entry__


def _modules():
    from . import cdc, curation, dedup, multimodal, relational, similarity, textops, xml_ingest

    return [dedup, similarity, textops, curation, multimodal, cdc, xml_ingest, relational]


def all_queries() -> dict[str, tuple]:
    out: dict[str, tuple] = {}
    for m in _modules():
        for name, pair in m.QUERIES.items():
            if name in out:
                raise ValueError(f"duplicate query name: {name}")
            out[name] = pair
    if len(out) > MAX_CHECKED - ENTRY_QUERIES:
        raise ValueError(
            f"registry has {len(out)} queries; only {MAX_CHECKED - ENTRY_QUERIES} "
            "fit inside the driver's CORRECTNESS window — fold new queries "
            "into a pack or merge redundant ones"
        )
    return out


def spark_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: builder for name, (builder, _) in all_queries().items()}


def oracle_queries() -> dict[str, str]:
    return {name: sql for name, (_, sql) in all_queries().items() if sql is not None}
