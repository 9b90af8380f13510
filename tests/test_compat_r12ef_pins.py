"""Independent plain-Python pins for the r12e/r12f tranches' entries
whose Spark and oracle texts are identical or near-identical
(events_running_concurrency — epoch-spelling swap only;
scalar_time_slots — same; window_lag_in_frame — collect_list vs list()
same structure). The driver hash proves parity there, not semantics;
these close the loop Python-side (the test_compat_r12c_pins rule).
"""

from __future__ import annotations

import math
from collections import defaultdict
from datetime import datetime, timedelta, timezone

import duckdb
import pandas as pd
from hypothesis import given, settings, strategies as st

from duckdb_extension_clickhouse_native_spark.plans import (  # noqa: F401
    compat_r12e,
    compat_r12f,
)
from duckdb_extension_clickhouse_native_spark.plans.base import REGISTRY


def _oracle(name: str) -> str:
    return REGISTRY.all()[name].oracle


events_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=10_000),  # event_id
        st.integers(min_value=0, max_value=500_000),  # second offset
        st.integers(min_value=0, max_value=5),  # user_id
        st.sampled_from(["click", "view", "purchase", "error"]),
        st.integers(min_value=3, max_value=3_000_000),  # cents
    ),
    min_size=1,
    max_size=70,
    unique_by=lambda r: r[0],
)


def _events_df(rows):
    base = datetime(2024, 1, 1, tzinfo=None)
    return pd.DataFrame(
        {
            "event_id": [r[0] for r in rows],
            "ts": [base + timedelta(seconds=r[1]) for r in rows],
            "user_id": [r[2] for r in rows],
            "event_type": [r[3] for r in rows],
            "value": [r[4] / 100.0 for r in rows],
        }
    )


def _cents(c):
    return math.floor((c / 100.0) * 100)


_EPOCH0 = int(datetime(2024, 1, 1, tzinfo=timezone.utc).timestamp())


@settings(max_examples=60, deadline=None)
@given(events_rows)
def test_running_concurrency_python_reference(rows):
    con = duckdb.connect()
    con.register("events", _events_df(rows))
    got = con.execute(_oracle("events_running_concurrency")).fetchall()[0]
    iv = [
        (_EPOCH0 + sec, _EPOCH0 + sec + 1 + _cents(c) % 600, eid)
        for eid, sec, uid, et, c in rows
        if et in ("click", "view")
    ]
    if not iv:
        assert got[2] in (0, None)
        return
    # markers: (t, kind, event_id); ends (kind 0) sort before begins
    markers = [(b, 1, eid) for b, e, eid in iv] + [
        (e, 0, None) for b, e, eid in iv
    ]
    # None sorts first within (t, kind) — mirror SQL NULLS FIRST
    markers.sort(key=lambda m: (m[0], m[1], m[2] is not None, m[2] or 0))
    conc = 0
    peak = 0
    at_starts = 0
    for t, kind, eid in markers:
        conc += 1 if kind == 1 else -1
        peak = max(peak, conc)
        if kind == 1:
            at_starts += conc
    assert got == (peak, at_starts, len(iv))


@settings(max_examples=60, deadline=None)
@given(events_rows)
def test_time_slots_python_reference(rows):
    con = duckdb.connect()
    con.register("events", _events_df(rows))
    got = con.execute(_oracle("scalar_time_slots")).fetchall()[0]
    slots = []
    for eid, sec, uid, et, c in rows:
        if et != "purchase":
            continue
        b = _EPOCH0 + sec
        dur = 1 + _cents(c) % 900
        t = (b // 300) * 300
        while t <= b + dur:
            slots.append(t)
            t += 300
    if not slots:
        assert got[0] in (0, None)
        return
    assert got == (len(slots), len(set(slots)), min(slots), max(slots))


@settings(max_examples=60, deadline=None)
@given(events_rows)
def test_lag_in_frame_python_reference(rows):
    con = duckdb.connect()
    con.register("events", _events_df(rows))
    got = con.execute(_oracle("window_lag_in_frame")).fetchall()
    per = defaultdict(list)
    for eid, sec, uid, et, c in rows:
        if uid % 17 == 0:
            per[uid].append((eid, _cents(c)))
    want = []
    for uid in sorted(per):
        seq = sorted(per[uid])
        for i, (eid, cents) in enumerate(seq):
            back = [v for _, v in seq[max(0, i - 2) : i + 1]]
            fwd = [v for _, v in seq[i : i + 3]]
            want.append(
                (
                    uid,
                    eid,
                    back[0] if len(back) == 3 else None,
                    fwd[-1] if len(fwd) == 3 else None,
                    len(back),
                )
            )
    want.sort()
    assert got == want
