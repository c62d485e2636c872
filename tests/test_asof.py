"""As-of join differential: the single-shuffle union+window plan vs
pandas ``merge_asof`` (the de-facto reference semantics for as-of
joins) across all four direction arms — backward, forward, nearest
(tie → backward), and backward-within-tolerance."""

from __future__ import annotations

import pandas as pd

from lens_sds_batch_spark.operators.relational import (
    ASOF_SPAN_S,
    ASOF_TOL_NS,
    asof_join,
)
from lens_sds_batch_spark.sources.parquet import load_events

from .conftest import SF_SMOKE


def test_asof_join_matches_pandas_merge_asof(spark):
    orders = pd.read_parquet(f"{SF_SMOKE}/orders.parquet")[
        ["o_orderkey", "o_custkey", "o_orderdate"]
    ]
    ev = (
        pd.DataFrame(
            [(r["user_id"], r["ts_ns"]) for r in load_events(spark, SF_SMOKE).collect()],
            columns=["uid", "ts"],
        )
        .sort_values("ts", kind="mergesort")
        .reset_index(drop=True)
    )
    # same probe mapping as the operator: data-derived base (floor-second
    # of the earliest event) + order epoch mod span
    base_s = int(ev["ts"].min()) // 1_000_000_000
    od_epoch = (
        (orders["o_orderdate"] - pd.Timestamp("1970-01-01")).dt.total_seconds().astype("int64")
    )
    probes = pd.DataFrame(
        {
            "o_orderkey": orders["o_orderkey"],
            "uid": orders["o_custkey"] % 15,
            "t": (base_s + od_epoch % ASOF_SPAN_S) * 1_000_000_000,
        }
    ).sort_values("t", kind="mergesort")

    def asof(direction, tolerance=None):
        m = pd.merge_asof(
            probes, ev, left_on="t", right_on="ts", by="uid",
            direction=direction, tolerance=tolerance,
        )
        return {
            int(r.o_orderkey): (None if pd.isna(r.ts) else int(r.ts) // 1_000_000_000)
            for r in m.itertuples()
        }

    want_b = asof("backward")
    want_f = asof("forward")
    want_n = asof("nearest")
    want_t = asof("backward", tolerance=ASOF_TOL_NS)

    got = {
        r["o_orderkey"]: r
        for r in asof_join(spark, SF_SMOKE).collect()
    }
    assert set(got) == set(want_b)
    for k, r in got.items():
        assert r["last_event_epoch"] == want_b[k], k
        assert r["next_event_epoch"] == want_f[k], k
        assert r["nearest_event_epoch"] == want_n[k], k
        assert r["last_event_epoch_within_tol"] == want_t[k], k

    # the arms are non-degenerate at this SF: each has hits AND misses
    vals = list(got.values())
    for col in ("last_event_epoch", "next_event_epoch", "last_event_epoch_within_tol"):
        hits = sum(1 for r in vals if r[col] is not None)
        assert 0 < hits < len(vals), col  # strict: real hits AND real misses
    assert all(r["nearest_event_epoch"] is not None for r in vals)


def test_asof_join_edge_cases(spark, tmp_path):
    """Crafted boundary shapes the corpus can't guarantee: exact
    ts==probe equality (inclusive BOTH directions), equidistant
    events (nearest tie -> backward), the tolerance boundary (<= at
    exactly ASOF_TOL_NS, miss one microsecond past it), and a user
    with no events at all (every arm NULL)."""
    import datetime as dt

    # tz-AWARE datetimes: PySpark converts naive datetimes via the
    # SYSTEM timezone (time.mktime), not spark.sql.session.timeZone,
    # so naive inputs would shift every instant on a non-UTC machine
    epoch = dt.datetime(1970, 1, 1, tzinfo=dt.timezone.utc)
    # the operator derives its probe base from min(event ts): an anchor
    # event (uid 9, no probe) at ANCHOR_S pins the base exactly, and all
    # other offsets stay above the tolerance window so the anchor is the
    # global minimum
    ANCHOR_S = 2_000_000_000

    def order(okey, uid, offset_s):
        # probe lands at ANCHOR_S + offset_s (odate = epoch + offset,
        # so epoch(odate) % ASOF_SPAN_S == offset for offset < span)
        assert offset_s < ASOF_SPAN_S
        return (okey, uid, epoch + dt.timedelta(seconds=offset_s))

    def event(uid, probe_offset_s, delta_us):
        ts = epoch + dt.timedelta(
            seconds=ANCHOR_S + probe_offset_s, microseconds=delta_us
        )
        return (1000 + uid, ts, uid, "e", 0.0, "{}")

    tol_us = ASOF_TOL_NS // 1000
    tol_s = ASOF_TOL_NS // 1_000_000_000
    off = {k: 30000 + 10000 * k for k in range(5)}  # all > tol_s above the anchor
    orders = [
        order(0, 0, off[0]),   # uid 0: exact-equality event
        order(1, 1, off[1]),   # uid 1: equidistant events at +-5s
        order(2, 2, off[2]),   # uid 2: backward exactly AT the tolerance bound
        order(3, 3, off[3]),   # uid 3: backward 1us PAST the tolerance bound
        order(4, 4, off[4]),   # uid 4: no events at all
    ]
    events = [
        (999, epoch + dt.timedelta(seconds=ANCHOR_S), 9, "anchor", 0.0, "{}"),
        event(0, off[0], 0),            # ts == probe exactly
        event(1, off[1], -5_000_000),   # 5s before
        event(1, off[1], 5_000_000),    # 5s after (equidistant)
        event(2, off[2], -tol_us),      # exactly tolerance behind
        event(3, off[3], -(tol_us + 1)),  # one microsecond too far
    ]
    d = str(tmp_path)
    spark.createDataFrame(
        orders, "o_orderkey long, o_custkey long, o_orderdate timestamp"
    ).coalesce(1).write.parquet(f"{d}/orders.parquet")
    spark.createDataFrame(
        events,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    ).coalesce(1).write.parquet(f"{d}/events.parquet")

    got = {r["o_orderkey"]: r for r in asof_join(spark, d).collect()}
    t = {k: ANCHOR_S + off[k] for k in range(4)}

    # exact equality: inclusive both directions, nearest == both
    r0 = got[0]
    assert (
        r0["last_event_epoch"]
        == r0["next_event_epoch"]
        == r0["nearest_event_epoch"]
        == r0["last_event_epoch_within_tol"]
        == t[0]
    )
    # equidistant: nearest tie breaks BACKWARD (floor-second of t-5s)
    r1 = got[1]
    assert r1["last_event_epoch"] == t[1] - 5
    assert r1["next_event_epoch"] == t[1] + 5
    assert r1["nearest_event_epoch"] == t[1] - 5
    # tolerance: <= at the bound hits; 1us past misses
    assert got[2]["last_event_epoch_within_tol"] == t[2] - tol_s
    assert got[3]["last_event_epoch"] is not None
    assert got[3]["last_event_epoch_within_tol"] is None
    # empty group: every arm NULL
    r4 = got[4]
    assert all(
        r4[c] is None
        for c in (
            "last_event_epoch",
            "next_event_epoch",
            "nearest_event_epoch",
            "last_event_epoch_within_tol",
        )
    )
