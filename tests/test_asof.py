"""As-of join differential: the single-shuffle union+window plan vs
pandas ``merge_asof`` (the de-facto reference semantics for as-of
joins) across all four direction arms — backward, forward, nearest
(tie → backward), and backward-within-tolerance."""

from __future__ import annotations

import pandas as pd

from lens_sds_batch_spark.operators.relational import (
    ASOF_BASE_S,
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
    # same probe mapping as the operator: base + order epoch mod span
    od_epoch = (
        (orders["o_orderdate"] - pd.Timestamp("1970-01-01")).dt.total_seconds().astype("int64")
    )
    probes = pd.DataFrame(
        {
            "o_orderkey": orders["o_orderkey"],
            "uid": orders["o_custkey"] % 15,
            "t": (ASOF_BASE_S + od_epoch % ASOF_SPAN_S) * 1_000_000_000,
        }
    ).sort_values("t", kind="mergesort")
    ev = (
        pd.DataFrame(
            [(r["user_id"], r["ts_ns"]) for r in load_events(spark, SF_SMOKE).collect()],
            columns=["uid", "ts"],
        )
        .sort_values("ts", kind="mergesort")
        .reset_index(drop=True)
    )

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
        assert 0 < hits <= len(vals), col
    assert all(r["nearest_event_epoch"] is not None for r in vals)
