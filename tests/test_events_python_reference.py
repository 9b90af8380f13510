"""Independent-reference pins for the event-analytics and graph
operators (extends the r9 dedup/similarity hardening): the DuckDB
oracle SQL (and for CC, the Spark operator itself) checked against
plain-Python brute-force implementations on random inputs, so shared-
template semantics are pinned by something other than the twin SQL.
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone
from itertools import combinations

import duckdb
import pandas as pd
from hypothesis import given, settings, strategies as st

from duckdb_extension_clickhouse_native_spark.operators import funnel

CHAIN = funnel.FUNNEL_CHAIN  # ("view", "click", "purchase")
WINDOW_US = 4 * 3600 * 1_000_000
EPOCH = datetime(2024, 1, 1, tzinfo=timezone.utc).replace(tzinfo=None)

# events: (user_id, event_id, type_idx, minutes-offset). Type indexes
# include 3 = an off-chain type; minutes spread far enough that the
# 4 h window actually bites.
event_strategy = st.tuples(
    st.integers(0, 2),            # user_id
    st.integers(0, 3),            # type index (3 -> 'other')
    st.integers(0, 600),          # minutes offset (10 h span)
)
events_strategy = st.lists(event_strategy, min_size=0, max_size=14)

TYPES = list(CHAIN) + ["other"]


def _events_df(raw: list[tuple[int, int, int]]) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "event_id": range(len(raw)),
            "user_id": [u for u, _, _ in raw],
            "event_type": [TYPES[t] for _, t, _ in raw],
            "ts": [EPOCH + timedelta(minutes=m) for _, _, m in raw],
            "value": [1.0] * len(raw),
        }
    )


def ref_window_funnel(pdf: pd.DataFrame) -> dict[int, int]:
    """Brute force: max k such that an increasing (t, event_id)
    subsequence typed chain[0..k-1] fits inside the window."""
    out = {}
    for uid, g in pdf.groupby("user_id"):
        rows = sorted(
            (int(r.ts.timestamp() * 1_000_000), int(r.event_id), r.event_type)
            for r in g.itertuples()
        )
        best = 0
        for k in range(1, len(CHAIN) + 1):
            found = False
            for idx in combinations(range(len(rows)), k):
                if all(rows[i][2] == CHAIN[j] for j, i in enumerate(idx)) and (
                    rows[idx[-1]][0] - rows[idx[0]][0] <= WINDOW_US
                ):
                    found = True
                    break
            if found:
                best = k
            else:
                break  # level k+1 needs a level-k prefix
        if len(rows):
            out[int(uid)] = best
    return out


@settings(max_examples=80, deadline=None)
@given(events_strategy)
def test_window_funnel_oracle_matches_bruteforce(raw):
    pdf = _events_df(raw)
    con = duckdb.connect()
    con.register("events", pdf)
    got = dict(con.execute(funnel.window_funnel_sql("duckdb")).fetchall())
    exp = {
        u: lvl
        for u, lvl in ref_window_funnel(pdf).items()
        # the SQL only emits users having at least one chain-typed event
        if (pdf[pdf.user_id == u].event_type.isin(CHAIN)).any()
    }
    assert got == exp


def ref_retention(pdf: pd.DataFrame, max_offset: int = 30) -> dict:
    days = {
        (int(r.user_id), int(r.ts.timestamp()) // 86400)
        for r in pdf.itertuples()
    }
    cohort = {}
    for u, d in days:
        cohort[u] = min(cohort.get(u, d), d)
    out = {}
    for u, d in days:
        off = d - cohort[u]
        if off <= max_offset:
            out.setdefault((cohort[u], off), set()).add(u)
    return {k: len(v) for k, v in out.items()}


@settings(max_examples=80, deadline=None)
@given(events_strategy)
def test_retention_oracle_matches_bruteforce(raw):
    pdf = _events_df(raw)
    con = duckdb.connect()
    con.register("events", pdf)
    got = {
        (c, o): n
        for c, o, n in con.execute(funnel.retention_sql("duckdb")).fetchall()
    }
    assert got == ref_retention(pdf)


# -- connected components vs union-find (the Spark operator itself) ---------

edges_strategy = st.lists(
    st.tuples(st.integers(0, 9), st.integers(0, 9)), min_size=0, max_size=15
)


def ref_components(n_nodes: int, edges: list[tuple[int, int]]) -> dict[int, int]:
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # component label = min node id in the component
    comp = {}
    for x in range(n_nodes):
        r = find(x)
        comp.setdefault(r, []).append(x)
    return {x: min(members) for r, members in comp.items() for x in members}


@settings(max_examples=8, deadline=None)
@given(edges_strategy)
def test_propagate_min_labels_matches_union_find(spark, raw_edges):
    from duckdb_extension_clickhouse_native_spark.operators.components import (
        propagate_min_labels,
    )

    n = 10
    edges = spark.createDataFrame(
        pd.DataFrame(
            {"src": [a for a, _ in raw_edges] or pd.Series([], dtype="int64"),
             "dst": [b for _, b in raw_edges] or pd.Series([], dtype="int64")}
        ).astype("int64"),
        schema="src long, dst long",
    )
    seeds = spark.createDataFrame(
        pd.DataFrame({"id": range(n), "label": range(n)}).astype("int64"),
        schema="id long, label long",
    )
    got = {r["id"]: r["label"] for r in propagate_min_labels(edges, seeds).collect()}
    assert got == ref_components(n, raw_edges)


# -- sequenceMatch code strings vs plain-Python regex -----------------------


def ref_sequence_match(pdf: pd.DataFrame) -> dict[int, tuple]:
    import re

    code = {"view": "v", "click": "c", "purchase": "p", "signup": "s"}
    out = {}
    for uid, g in pdf.groupby("user_id"):
        rows = sorted(
            (int(r.ts.timestamp() * 1_000_000), int(r.event_id), r.event_type)
            for r in g.itertuples()
        )
        seq = "".join(code.get(t, "e") for _, _, t in rows)
        out[int(uid)] = (
            1 if re.search("v.*c.*p", seq) else 0,
            1 if re.search("v[^p]*c[^v]*p", seq) else 0,
            1 if "ss" in seq else 0,
            len(seq),
        )
    return out


@settings(max_examples=80, deadline=None)
@given(events_strategy)
def test_sequence_match_oracle_matches_python(raw):
    # reuse the funnel strategy but map type idx 3 to 'signup' so the
    # double-signup pattern is reachable
    pdf = _events_df(raw)
    pdf["event_type"] = pdf["event_type"].replace({"other": "signup"})
    con = duckdb.connect()
    con.register("events", pdf)
    got = {
        r[0]: tuple(r[1:])
        for r in con.execute(funnel.sequence_match_sql("duckdb")).fetchall()
    }
    assert got == ref_sequence_match(pdf)


# -- gap fill / LOCF vs plain-Python ----------------------------------------


def ref_gap_fill(pdf: pd.DataFrame, n_hours: int = 720) -> dict:
    """Mirror gap_fill_sql: hourly spine per type from the fixed epoch,
    zero-filled counts, LOCF value means."""
    base_hour = 1_704_067_200 // 3600
    hours = {}
    for r in pdf.itertuples():
        h = int(r.ts.timestamp()) // 3600
        key = (r.event_type, h)
        hours.setdefault(key, []).append(float(r.value))
    types = sorted({t for t, _ in hours})
    out = {}
    for t in types:
        last = None
        for h in range(base_hour, base_hour + n_hours):
            vals = hours.get((t, h))
            if vals:
                # exact decimal mean, like the SQL's DECIMAL sum / count
                from decimal import Decimal

                s = sum(Decimal(str(v)).quantize(Decimal("0.0001")) for v in vals)
                last = float(s) / len(vals)
            out[(t, h)] = (len(vals) if vals else 0, last)
    return out


@settings(max_examples=40, deadline=None)
@given(events_strategy)
def test_gap_fill_oracle_matches_python(raw):
    pdf = _events_df(raw)
    # keep timestamps inside the spine (EPOCH = 2024-01-01 + minutes)
    con = duckdb.connect()
    con.register("events", pdf)
    sql = funnel.gap_fill_sql("duckdb", n_hours=12)
    rows = con.execute(sql).fetchall()
    exp = ref_gap_fill(pdf, n_hours=12)
    got = {(r[0], r[1]): (r[2], r[3]) for r in rows}
    assert got == exp


def ref_strict_funnel(pdf: pd.DataFrame) -> dict[int, int]:
    """Greedy fold for strict_order: any non-matching event resets,
    chain[0] always re-arms, window measured from the chain start.
    For chains with distinct step types this equals the
    consecutive-run formulation the SQL uses."""
    out = {}
    for uid, g in pdf.groupby("user_id"):
        rows = sorted(
            (int(r.ts.timestamp() * 1_000_000), int(r.event_id), r.event_type)
            for r in g.itertuples()
        )
        best = level = 0
        start = 0
        for t, _e, ty in rows:
            if (
                level < len(CHAIN)
                and ty == CHAIN[level]
                and (level == 0 or t - start <= WINDOW_US)
            ):
                if level == 0:
                    start = t
                level += 1
            elif ty == CHAIN[0]:
                level, start = 1, t
            else:
                level = 0
            best = max(best, level)
        if rows:
            out[int(uid)] = best
    return out


@settings(max_examples=80, deadline=None)
@given(events_strategy)
def test_strict_funnel_oracle_matches_greedy(raw):
    pdf = _events_df(raw)
    con = duckdb.connect()
    con.register("events", pdf)
    got = dict(
        con.execute(funnel.window_funnel_strict_sql("duckdb")).fetchall()
    )
    assert got == ref_strict_funnel(pdf)


def test_strict_funnel_spark_form_matches_greedy(spark):
    """The forward-LEAD Spark form against the greedy reference on a
    hostile fixed corpus (interrupts, restarts, window expiry, ties)."""
    rows = [
        # u0: view click purchase inside window -> 3
        (0, 0, 0), (0, 1, 10), (0, 2, 20),
        # u1: view OTHER click purchase -> interrupt at other -> 1
        (1, 0, 0), (1, 3, 5), (1, 1, 10), (1, 2, 20),
        # u2: view click [window expires] purchase -> 2
        (2, 0, 0), (2, 1, 10), (2, 2, 590),
        # u3: view view click purchase -> restart still reaches 3
        (3, 0, 0), (3, 0, 5), (3, 1, 10), (3, 2, 15),
        # u4: click purchase (no view) -> 0
        (4, 1, 0), (4, 2, 10),
    ]
    raw = [(u, t, m) for u, t, m in rows]
    pdf = _events_df(raw)
    d = pdf.copy()
    d["props"] = "{}"
    sdf = spark.createDataFrame(d)
    sdf.createOrReplaceTempView("events")
    got = {
        r.user_id: r.strict_level
        for r in spark.sql(funnel.window_funnel_strict_sql("spark")).collect()
    }
    exp = ref_strict_funnel(pdf)
    assert got == exp == {0: 3, 1: 1, 2: 2, 3: 3, 4: 0}
