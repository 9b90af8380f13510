"""Independent plain-Python pins for the round-12 third compat tranche.

``stats_mean_ztest``, ``quantile_timing_grid`` and
``agg_categorical_iv`` emit the SAME SQL text for Spark and DuckDB and
``agg_group_uniq_array`` a near-identical one — the driver's hash check
then proves parity, not semantics.  These tests pin the DuckDB ORACLE
against structurally unrelated plain-Python implementations on
hypothesis-generated inputs (the test_compat_r12_pins precedent), so
Spark == oracle == Python closes the loop.  ``tf_numbers_lcg`` and the
``array_fold_has_ops`` fold get hand/Python fixtures pinning LCG values
and fold ORDER.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from functools import reduce

import duckdb
import pandas as pd
import pytest
from hypothesis import assume, given, settings, strategies as st

from duckdb_extension_clickhouse_native_spark.plans import compat_r12c  # noqa: F401
from duckdb_extension_clickhouse_native_spark.plans.base import REGISTRY


def _oracle(name: str) -> str:
    return REGISTRY.all()[name].oracle


# --- meanZTest -----------------------------------------------------------------

orders_strategy = st.lists(
    st.tuples(
        st.sampled_from(["F", "O", "P"]),  # o_orderstatus ('P' is noise)
        st.integers(min_value=100, max_value=9_999_999),  # price cents
    ),
    min_size=4,
    max_size=80,
)


@settings(max_examples=60, deadline=None)
@given(orders_strategy)
def test_mean_ztest_python_reference(rows):
    # mirror the SQL's FLOOR(value*100) on the DOUBLE value — cents do
    # not always round-trip through /100.0 (e.g. 251 -> 2.51 -> 250)
    f = [math.floor((c / 100.0) * 100) for s, c in rows if s == "F"]
    o = [math.floor((c / 100.0) * 100) for s, c in rows if s == "O"]
    assume(len(f) >= 2 and len(o) >= 2)
    # population variances; the z denominator must be positive
    vf = sum(x * x for x in f) / len(f) - (sum(f) / len(f)) ** 2
    vo = sum(x * x for x in o) / len(o) - (sum(o) / len(o)) ** 2
    denom = vf / len(f) + vo / len(o)
    assume(denom > 1e-9)
    df = pd.DataFrame(
        {
            "o_orderstatus": [s for s, _ in rows],
            "o_totalprice": [c / 100.0 for _, c in rows],
        }
    )
    con = duckdb.connect()
    con.register("orders", df)
    n_x, n_y, sum_x, sum_y, z = con.execute(
        _oracle("stats_mean_ztest")
    ).fetchall()[0]
    assert (n_x, n_y) == (len(f), len(o))
    # cents reconstruction is exact (floor of value*100 round-trips)
    assert (sum_x, sum_y) == (sum(f), sum(o))
    want_z = (sum(f) / len(f) - sum(o) / len(o)) / math.sqrt(denom)
    assert z == pytest.approx(want_z, abs=2e-6)


# --- quantileTiming ------------------------------------------------------------

values_strategy = st.lists(
    st.integers(min_value=0, max_value=3_000_000),  # cents (value = /100)
    min_size=1,
    max_size=120,
)


def _timing_grid(ms: int) -> int:
    if ms < 1024:
        return ms
    if ms <= 30000:
        return (ms // 16) * 16
    return 30000


@settings(max_examples=60, deadline=None)
@given(values_strategy)
def test_quantile_timing_python_reference(cents):
    df = pd.DataFrame({"value": [c / 100.0 for c in cents]})
    con = duckdb.connect()
    con.register("events", df)
    p50, p90, p99, n = con.execute(
        _oracle("quantile_timing_grid")
    ).fetchall()[0]
    grid = sorted(
        _timing_grid(int(math.floor((c / 100.0) * 37)) % 40000)
        for c in cents
    )
    assert n == len(grid)

    def type1(q: float) -> int:
        return grid[math.ceil(q * len(grid)) - 1]

    assert (p50, p90, p99) == (type1(0.5), type1(0.9), type1(0.99))


# --- categoricalInformationValue ------------------------------------------------

NATIONS = ["ALGERIA", "BRAZIL", "CANADA", "DENMARK"]

iv_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=11),  # custkey
        st.sampled_from(
            ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
        ),
    ),
    min_size=4,
    max_size=100,
)


@settings(max_examples=60, deadline=None)
@given(iv_strategy)
def test_categorical_iv_python_reference(rows):
    con = duckdb.connect()
    con.register(
        "orders",
        pd.DataFrame(
            {
                "o_custkey": [k for k, _ in rows],
                "o_orderpriority": [p for _, p in rows],
            }
        ),
    )
    con.register(
        "customer",
        pd.DataFrame(
            {"c_custkey": list(range(12)), "c_nationkey": [k % 4 for k in range(12)]}
        ),
    )
    con.register(
        "nation",
        pd.DataFrame({"n_nationkey": list(range(4)), "n_name": NATIONS}),
    )
    good = Counter()
    bad = Counter()
    for custkey, prio in rows:
        cat = NATIONS[custkey % 4]
        if prio in ("1-URGENT", "2-HIGH"):
            good[cat] += 1
        else:
            bad[cat] += 1
    g = sum(good.values())
    b = sum(bad.values())
    cats = [c for c in NATIONS if good[c] > 0 and bad[c] > 0]
    assume(cats and g > 0 and b > 0)
    iv = sum(
        (good[c] / g - bad[c] / b) * math.log((good[c] / g) / (bad[c] / b))
        for c in cats
    )
    got_iv, n_cats, good_total, bad_total = con.execute(
        _oracle("agg_categorical_iv")
    ).fetchall()[0]
    assert n_cats == len(cats)
    assert (good_total, bad_total) == (g, b)
    assert got_iv == pytest.approx(iv, abs=2e-6)


# --- numbers() + LCG -------------------------------------------------------------


def test_numbers_lcg_python_reference():
    con = duckdb.connect()
    n, sum_v, min_v, max_v, bucket3 = con.execute(
        _oracle("tf_numbers_lcg")
    ).fetchall()[0]
    vs = [(i * 1103515245 + 12345) % 2147483648 for i in range(100000)]
    assert n == 100000
    assert sum_v == sum(vs)
    assert (min_v, max_v) == (min(vs), max(vs))
    assert bucket3 == sum(1 for v in vs if v % 10 == 3)
    # hand-pinned first values of the classic 31-bit LCG:
    # 0*a+c = 12345; 1*a+c = 1103527590; (2*a+c) mod 2^31 = 59559187
    assert vs[:3] == [12345, 1103527590, 59559187]


# --- arrayFold order + hasSubstr contiguity ---------------------------------------

lineitem_strategy = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=40),  # orderkey multiplier
        st.integers(min_value=1, max_value=7),  # linenumber
        st.integers(min_value=1, max_value=50),  # quantity
        st.integers(min_value=0, max_value=9999),  # partkey
        st.integers(min_value=0, max_value=9999),  # suppkey
    ),
    min_size=1,
    max_size=60,
    unique_by=lambda r: (r[0], r[1]),
)


@settings(max_examples=60, deadline=None)
@given(lineitem_strategy)
def test_array_fold_python_reference(rows):
    df = pd.DataFrame(
        {
            "l_orderkey": [ok * 101 for ok, ln, q, p, s in rows],
            "l_linenumber": [ln for ok, ln, q, p, s in rows],
            "l_quantity": [float(q) for ok, ln, q, p, s in rows],
            "l_partkey": [p for ok, ln, q, p, s in rows],
            "l_suppkey": [s for ok, ln, q, p, s in rows],
        }
    )
    con = duckdb.connect()
    con.register("lineitem", df)
    got = con.execute(_oracle("array_fold_has_ops")).fetchall()
    want = []
    for ok, ln, q, p, s in sorted(rows):
        a = [ln, q, p % 7, s % 5]
        sub = [p % 7, s % 5]
        folded = reduce(lambda acc, x: acc * 3 + x, a, 0)
        has_all = all(x in a for x in sub)
        has_any = any(x in (3, 4) for x in a)
        astr = "|" + "|".join(str(x) for x in a) + "|"
        sstr = "|" + "|".join(str(x) for x in sub) + "|"
        want.append(
            (ok * 101, ln, folded, has_all, has_any, sstr in astr)
        )
    assert got == want


# --- anyHeavy mode + kahan sums ---------------------------------------------------


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["A", "N", "R"]),  # returnflag
            st.sampled_from(["F", "O", "P"]),  # linestatus
            st.integers(min_value=1, max_value=50),
            st.integers(min_value=100, max_value=9_999_999),  # price cents
        ),
        min_size=1,
        max_size=80,
    )
)
def test_group_uniq_array_python_reference(rows):
    df = pd.DataFrame(
        {
            "l_returnflag": [r for r, s, q, c in rows],
            "l_linestatus": [s for r, s, q, c in rows],
            "l_quantity": [float(q) for r, s, q, c in rows],
            "l_extendedprice": [c / 100.0 for r, s, q, c in rows],
        }
    )
    con = duckdb.connect()
    con.register("lineitem", df)
    got = con.execute(_oracle("agg_group_uniq_array")).fetchall()
    per = defaultdict(list)
    for r, s, q, c in rows:
        per[r].append((s, q, c))
    want = []
    for r in sorted(per):
        grp = per[r]
        statuses = ",".join(sorted({s for s, q, c in grp}))
        counts = Counter(s for s, q, c in grp)
        # mode, ties broken by the smaller status value
        heavy = min(counts, key=lambda s: (-counts[s], s))
        want.append(
            (
                r,
                statuses,
                sum(q for s, q, c in grp),
                len(grp),
                # FLOOR on the double, not the original integer cents
                sum(math.floor((c / 100.0) * 100) for s, q, c in grp),
                heavy,
            )
        )
    assert got == want


# --- r12d tranche: groupArrayInsertAt + quantileDeterministic ------------------
# (near-identical / identical Spark-vs-oracle texts — same pin rule)

from datetime import datetime, timedelta

from duckdb_extension_clickhouse_native_spark.plans import compat_r12d  # noqa: F401,E402
from duckdb_extension_clickhouse_native_spark.native.writer import (  # noqa: E402
    SAMPLE_HASH_A,
    SAMPLE_HASH_M,
)

events_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=10_000),  # event_id
        st.integers(min_value=0, max_value=47),  # hour offset
        st.integers(min_value=0, max_value=5),  # user_id
        st.integers(min_value=3, max_value=3_000_000),  # cents
    ),
    min_size=1,
    max_size=80,
)


def _events_df(rows):
    base = datetime(2024, 1, 1)
    return pd.DataFrame(
        {
            "event_id": [r[0] for r in rows],
            "ts": [base + timedelta(hours=r[1]) for r in rows],
            "user_id": [r[2] for r in rows],
            "event_type": ["click" for _ in rows],
            "value": [r[3] / 100.0 for r in rows],
        }
    )


@settings(max_examples=60, deadline=None)
@given(events_rows)
def test_group_array_insert_at_python_reference(rows):
    con = duckdb.connect()
    con.register("events", _events_df(rows))
    got = con.execute(_oracle("agg_group_array_insert_at")).fetchall()
    slots = defaultdict(dict)
    for eid, h, uid, cents in rows:
        # hour(ts) is the wall-clock hour, which wraps at 24
        p = (h % 24) % 4
        v = math.floor((cents / 100.0) * 100)
        cur = slots[uid].get(p)
        slots[uid][p] = v if cur is None else min(cur, v)
    want = [
        (
            uid,
            ",".join(
                str(slots[uid][i]) if i in slots[uid] else "-"
                for i in range(4)
            ),
        )
        for uid in sorted(slots)
    ]
    assert got == want


@settings(max_examples=60, deadline=None)
@given(events_rows)
def test_quantile_deterministic_python_reference(rows):
    con = duckdb.connect()
    con.register("events", _events_df(rows))
    got = con.execute(_oracle("quantile_deterministic")).fetchall()[0]
    m, a = SAMPLE_HASH_M, SAMPLE_HASH_A
    xs = sorted(
        math.floor((cents / 100.0) * 100)
        for eid, h, uid, cents in rows
        if (eid % m) * a % m * a % m < m // 2
    )
    if not xs:
        assert got == (None, None, None) or got[2] in (0, None)
        return

    def type1(q):
        return xs[math.ceil(q * len(xs)) - 1]

    assert got == (type1(0.5), type1(0.9), len(xs))
