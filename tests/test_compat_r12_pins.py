"""Independent plain-Python pins for the round-12 compat tranche.

Several round-12 entries emit the SAME SQL text for Spark and DuckDB
(collapsing merges, theta sketch set-ops, the recursive calendar) or
near-identical texts (MAD, Benford) — the driver's hash check then
proves parity, not semantics.  These tests pin the DuckDB ORACLE
against structurally unrelated plain-Python implementations on
hypothesis-generated inputs (the test_dedup_python_reference
precedent), so Spark == oracle == Python closes the loop.
"""

from __future__ import annotations

import math
import statistics
from collections import defaultdict
from datetime import datetime, timedelta

import duckdb
import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st

from duckdb_extension_clickhouse_native_spark.plans import compat_r12  # noqa: F401
from duckdb_extension_clickhouse_native_spark.plans.base import REGISTRY

EVENT_TYPES = ["click", "view", "purchase", "error", "signup"]
POSITIVE = {"click", "view", "purchase"}

events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=10_000),  # event_id
        st.integers(min_value=0, max_value=40),  # day offset
        st.integers(min_value=0, max_value=5),  # user_id
        st.sampled_from(EVENT_TYPES),
        st.integers(min_value=3, max_value=32753),  # cents (value = /100)
    ),
    min_size=1,
    max_size=60,
)


def _events_con(rows):
    base = datetime(2024, 1, 1)
    df = pd.DataFrame(
        {
            "event_id": [r[0] for r in rows],
            "ts": [base + timedelta(days=r[1], hours=r[0] % 24) for r in rows],
            "user_id": [r[2] for r in rows],
            "event_type": [r[3] for r in rows],
            "value": [r[4] / 100.0 for r in rows],
            "props": ["{}" for _ in rows],
        }
    )
    con = duckdb.connect()
    con.register("events", df)
    return con


def _oracle(name: str) -> str:
    return REGISTRY.all()[name].oracle


def _cents(v: float) -> int:
    return int(math.floor(v * 100))


@settings(max_examples=60, deadline=None)
@given(events_strategy)
def test_collapsing_merge_python_reference(rows):
    con = _events_con(rows)
    got = con.execute(_oracle("events_collapsing_merge")).fetchall()
    net = defaultdict(lambda: [0, 0])
    for eid, day, uid, etype, cents in rows:
        sign = 1 if etype in POSITIVE else -1
        c = _cents(cents / 100.0)
        net[uid][0] += sign
        net[uid][1] += sign * c
    want = sorted(
        (uid, n, c) for uid, (n, c) in net.items() if n > 0
    )
    assert got == want


@settings(max_examples=60, deadline=None)
@given(events_strategy)
def test_collapsing_versioned_python_reference(rows):
    con = _events_con(rows)
    got = con.execute(_oracle("events_collapsing_versioned")).fetchall()
    base = datetime(2024, 1, 1)
    net = defaultdict(lambda: [0, 0])
    for eid, day, uid, etype, cents in rows:
        sign = 1 if etype in POSITIVE else -1
        c = _cents(cents / 100.0)
        key = (uid, base + timedelta(days=day))
        net[key][0] += sign
        net[key][1] += sign * c
    live = {k: v for k, v in net.items() if v[0] > 0}
    latest = {}
    for (uid, ver), v in live.items():
        if uid not in latest or ver > latest[uid][0]:
            latest[uid] = (ver, v)
    want = sorted(
        (uid, ver, v[0], v[1]) for uid, (ver, v) in latest.items()
    )
    assert got == want


def _kmv(hashes: set, k: int = 128, m: int = 2147483647):
    """(kth-or-None, n_retained, theta, estimate) of a KMV sketch."""
    smallest = sorted(hashes)[:k]
    n = len(smallest)
    kth = smallest[-1] if smallest else None
    theta = m if n < k else kth
    est = n if n < k else int(math.floor((k - 1) * float(m) / kth))
    return smallest, n, theta, est


@settings(max_examples=60, deadline=None)
@given(events_strategy)
def test_theta_setops_python_reference(rows):
    con = _events_con(rows)
    got = con.execute(_oracle("approx_theta_setops")).fetchall()
    m = 2147483647
    ha = {(eid * 48271) % m for eid, d, u, et, c in rows if et == "click"}
    hb = {(eid * 48271) % m for eid, d, u, et, c in rows if c / 100.0 >= 100}
    sa, na, theta_a, est_a = _kmv(ha)
    sb, nb, theta_b, est_b = _kmv(hb)
    su, nu, theta_u, est_u = _kmv(set(sa) | set(sb))
    theta = min(theta_a, theta_b)
    common = len([h for h in set(sa) & set(sb) if h < theta])
    est_inter = int(math.floor(common * float(m) / theta))
    exact_a = len({eid for eid, d, u, et, c in rows if et == "click"})
    exact_b = len({eid for eid, d, u, et, c in rows if c / 100.0 >= 100})
    assert got == [(est_a, est_b, est_u, est_inter, exact_a, exact_b)]


@settings(max_examples=40, deadline=None)
@given(events_strategy)
def test_mad_outliers_python_reference(rows):
    con = _events_con(rows)
    got = con.execute(_oracle("stats_mad_outliers")).fetchall()
    groups = defaultdict(list)
    for eid, d, u, et, cents in rows:
        groups[et].append(_cents(cents / 100.0))
    want = []
    for et in sorted(groups):
        xs = groups[et]
        med = statistics.median(xs)
        dev2 = [abs(2 * x - int(2 * med)) for x in xs]
        mad2 = statistics.median(dev2)
        n_out = sum(1 for d2 in dev2 if d2 > 3 * mad2)
        want.append((et, float(med), mad2 / 2.0, n_out, len(xs)))
    assert got == want


orders_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=900),  # month offset limited
        st.integers(min_value=1, max_value=60_000_000),  # cents
    ),
    min_size=1,
    max_size=50,
)


@settings(max_examples=40, deadline=None)
@given(orders_strategy)
def test_recursive_calendar_python_reference(rows):
    base = datetime(1995, 1, 1)
    df = pd.DataFrame(
        {
            "o_orderkey": range(len(rows)),
            "o_custkey": [0] * len(rows),
            "o_orderstatus": ["O"] * len(rows),
            "o_totalprice": [c / 100.0 for d, c in rows],
            "o_orderdate": [base + timedelta(days=d) for d, c in rows],
            "o_orderpriority": ["1-URGENT"] * len(rows),
        }
    )
    con = duckdb.connect()
    con.register("orders", df)
    got = con.execute(_oracle("cte_recursive_calendar")).fetchall()

    def month_trunc(dt):
        return datetime(dt.year, dt.month, 1)

    def next_month(dt):
        return datetime(
            dt.year + (dt.month == 12), dt.month % 12 + 1, 1
        )

    dates = [base + timedelta(days=d) for d, c in rows]
    per_month = defaultdict(lambda: [0, 0])
    for (d, c), dt in zip(rows, dates):
        mt = month_trunc(dt)
        per_month[mt][0] += 1
        per_month[mt][1] += _cents(c / 100.0)
    spine = []
    cur, stop = month_trunc(min(dates)), month_trunc(max(dates))
    while True:
        spine.append(cur)
        if cur >= stop:
            break
        cur = next_month(cur)
    want = [
        (mth, per_month[mth][0], per_month[mth][1]) for mth in spine
    ]
    assert got == want


@settings(max_examples=40, deadline=None)
@given(orders_strategy)
def test_benford_python_reference(rows):
    base = datetime(1995, 1, 1)
    df = pd.DataFrame(
        {
            "o_orderkey": range(len(rows)),
            "o_custkey": [0] * len(rows),
            "o_orderstatus": ["O"] * len(rows),
            "o_totalprice": [c / 100.0 for d, c in rows],
            "o_orderdate": [base + timedelta(days=d) for d, c in rows],
            "o_orderpriority": ["1-URGENT"] * len(rows),
        }
    )
    con = duckdb.connect()
    con.register("orders", df)
    got = con.execute(_oracle("stats_benford_digits")).fetchall()
    from duckdb_extension_clickhouse_native_spark.plans.compat_r12 import (
        _BENFORD_P,
    )

    counts = defaultdict(int)
    for d, c in rows:
        cents = _cents(c / 100.0)
        if cents > 0:
            counts[int(str(cents)[0])] += 1
    t = sum(counts.values())
    assert len(got) == 9
    for (digit, n_obs, p_obs, p_benford, chi2), (dd, pp) in zip(
        got, _BENFORD_P
    ):
        p = float(pp)
        assert digit == dd
        assert n_obs == counts.get(dd, 0)
        assert abs(p_obs - counts.get(dd, 0) / t) < 2e-9
        assert p_benford == pytest.approx(p, abs=1e-15)
        exp = t * p
        assert chi2 == pytest.approx(
            (counts.get(dd, 0) - exp) ** 2 / exp, abs=2e-9
        )
