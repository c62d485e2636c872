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


# ---------------------------------------------------------------------------
# Predicate-power probes (r10 verdict #6): each operator module carries a
# PROBES dict NEXT TO its QUERIES; this aggregator enforces that every
# registered query has at least one probe, so a new query cannot ship
# probe-less (tools/power_audit.py iterates all_probes()).
#
# Probe spec: name -> (query, kind, sql)
#   kind "corpus": DuckDB SQL over the raw testdata views, returns (a, b)
#   kind "oracle": DuckDB SQL over `t` = the materialized oracle output
#                  of `query` (may also reference the raw views)
# A path has power when a > 0 and (b is None or b > 0); known-vacuous
# paths are whitelisted IN THE TOOL with their crafted-input test.
# ---------------------------------------------------------------------------

# the two flagship queries live in __spark_entry__, outside the module
# registry — their probes live here so the coverage invariant stays total
ENTRY_PROBES: dict[str, tuple] = {
    "odm constructor mix (distinct names beyond 13)": (
        "odm_commands", "oracle",
        "SELECT count(DISTINCT name) - 13, NULL FROM t"),
    "odm leaf-level remove constructors fire": (
        "odm_commands", "oracle",
        """SELECT count(*), NULL FROM t
           WHERE name IN ('odm-import/remove-item-group',
                          'odm-import/remove-item')"""),
    "odm uuid5 flavor (constructor mix, ids well-formed)": (
        "odm_commands_uuid5", "oracle",
        "SELECT (SELECT count(DISTINCT name) - 13 FROM t),"
        " (SELECT min(ids_wellformed) FROM t)"),
}


def all_probes() -> dict[str, tuple]:
    """Aggregate module PROBES + ENTRY_PROBES, enforcing total coverage:
    every query (registry + the two flagships) has >= 1 probe, every
    probe targets a real query, no duplicate probe names."""
    queries = set(all_queries()) | {"odm_commands", "odm_commands_uuid5"}
    out: dict[str, tuple] = dict(ENTRY_PROBES)
    for m in _modules():
        for name, spec in getattr(m, "PROBES", {}).items():
            if name in out:
                raise ValueError(f"duplicate probe name: {name}")
            out[name] = spec
    targeted = set()
    for name, (query, kind, _sql) in out.items():
        if query not in queries:
            raise ValueError(f"probe {name!r} targets unknown query {query!r}")
        if kind not in ("corpus", "oracle"):
            raise ValueError(f"probe {name!r} has unknown kind {kind!r}")
        targeted.add(query)
    missing = sorted(queries - targeted)
    if missing:
        raise ValueError(
            f"{len(missing)} registered queries have NO power probe "
            f"(add one to the module's PROBES next to QUERIES): {missing}"
        )
    return out
