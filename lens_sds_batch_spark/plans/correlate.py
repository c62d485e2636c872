"""Command↔event correlation (reference A20/A22/A24).

The reference publishes a command and awaits exactly the FIRST event
whose ``:cid`` equals the command ``:id`` (async pub on :cid,
``broker.clj:102-117,161``).  In DataFrame form: left equi-join
commands→events on ``id = cid`` + first-event-wins window rank;
commands with no event are the timeout path.

At scale this is a plain shuffled equi-join on cid — and in streaming
mode a stream-stream join with watermarks (streaming/pipeline.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def first_event_per_cid(events: DataFrame, order_cols: list[Column]) -> DataFrame:
    """Exactly one (the first) event per cid — A20's 'first wins'."""
    w = Window.partitionBy("cid").orderBy(*order_cols)
    return events.withColumn("__rk", F.row_number().over(w)).where(F.col("__rk") == 1).drop("__rk")


def first_event_name_agg(events: DataFrame, order_cols: list[str]) -> DataFrame:
    """first-event-wins as min(struct(order..., name)) — semantically
    identical to the window rank but MAP-SIDE COMBINABLE: each partition
    reduces to one candidate per cid before the shuffle, where the
    window form must shuffle+sort every event.  The scale choice when
    only the winning name is needed (3.2s → sub-second at sf0.1)."""
    packed = F.struct(*[F.col(c) for c in order_cols], F.col("name"))
    return events.groupBy("cid").agg(F.min(packed).getField("name").alias("name"))


def first_event_name_packed(
    events: DataFrame, encoded: list[tuple[Column, int]], name_col: str = "name"
) -> DataFrame:
    """first-event-wins as min() over ONE fixed-width packed string.

    Neither min(struct) nor min(string) hash-aggregates in Spark (the
    agg buffer isn't a fixed-size primitive), so both SortAggregate —
    but packing collapses the per-row comparison from an N-field struct
    walk to one memcmp.  Measured at sf0.1 (600k events): 2.5× faster
    than the struct form WARM (0.9s → 0.46s agg-only), equal COLD
    (~1.8s end-to-end, both I/O-bound) — so this is the choice for
    iterative/warm pipelines, while one-shot jobs can prefer the
    simpler struct form.  Identical output (`exceptAll` empty) to
    :func:`first_event_name_agg`.

    ``encoded`` is a list of (fixed-width string Column, width) pairs —
    zero-padded non-negative values so lexicographic == numeric order.
    ``name_col`` is concatenated last: it both rides along (extracted by
    substring after the Σwidths prefix) and serves as the final
    tiebreak, exactly like the struct form."""
    offset = sum(w for _, w in encoded) + 1
    packed = F.concat(*[c for c, _ in encoded], F.col(name_col))
    return events.groupBy("cid").agg(
        F.substring(F.min(packed), offset, 1_000_000).alias("name")
    )


def correlate(commands: DataFrame, first_events: DataFrame) -> DataFrame:
    """Left join: every command gets its first event's name or
    'timeout' (the reference's no-reply path)."""
    ev = first_events.select(F.col("cid"), F.col("name").alias("event_name"))
    return commands.join(ev, commands.cmd_id == ev.cid, "left").withColumn(
        "status", F.coalesce(F.col("event_name"), F.lit("timeout"))
    )


def success_set(correlated: DataFrame, success_names: list[str]) -> DataFrame:
    """The ids whose cascade may proceed (gates A11/A12 semi-joins)."""
    return correlated.where(F.col("status").isin(success_names)).select("cmd_id")
