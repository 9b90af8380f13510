"""Sketch-tier operators: the Misra-Gries candidate guarantee, the
int8 quantizer's cross-engine determinism, and the domain cap."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st


@given(
    st.lists(
        st.integers(min_value=0, max_value=30),  # small key domain -> heavy keys
        min_size=1,
        max_size=400,
    ),
    st.integers(min_value=1, max_value=8),   # m (candidate capacity)
    st.integers(min_value=2, max_value=30),  # batch size
)
@settings(deadline=None, max_examples=120)
def test_heavy_hitter_candidates_are_superset(keys, m, batch_size):
    """The batch-local frequency filter (count * (m+1) > batch_len)
    must produce a SUPERSET of every key with global frequency
    > n/(m+1) — for ANY batching. This is the pigeonhole bound the
    exact-verify stage relies on: a missed true heavy hitter would be
    a wrong answer, not a slow one."""
    n = len(keys)
    batches = [keys[i : i + batch_size] for i in range(0, n, batch_size)]
    cands = set()
    for b in batches:
        from collections import Counter

        for k, c in Counter(b).items():
            if c * (m + 1) > len(b):
                cands.add(k)
        # capacity claim: each batch contributes at most m+1 candidates
        assert sum(1 for k, c in Counter(b).items() if c * (m + 1) > len(b)) <= m + 1
    from collections import Counter

    heavy = {k for k, c in Counter(keys).items() if c * (m + 1) > n}
    assert heavy <= cands


def test_heavy_hitters_spark_matches_oracle(spark):
    """End-to-end on the real events table at sf0.001 (row-for-row,
    beyond the driver's hash compare)."""
    from duckdb_extension_clickhouse_native_spark.operators.sketches import (
        heavy_hitters_oracle_sql,
        heavy_hitters_query,
    )

    sf = "/root/testdata/sf0.001"
    got = [tuple(r) for r in heavy_hitters_query(spark, sf).collect()]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')"
    )
    want = con.execute(heavy_hitters_oracle_sql()).fetchall()
    assert got == want and len(got) > 0


@given(st.lists(st.floats(min_value=-10, max_value=10, width=32), min_size=4, max_size=4))
@settings(deadline=None, max_examples=80)
def test_int8_quantizer_duckdb_matches_python(vec):
    """floor(v*127/maxabs + 0.5) evaluated by DuckDB must equal the
    Python reference bit-for-bit (the determinism claim both engines
    and any executor rely on)."""
    con = duckdb.connect()
    ma = max(max(abs(v) for v in vec), 1e-30)
    want = [int((v * 127.0 / ma + 0.5) // 1) for v in vec]
    lit = "[" + ", ".join(f"CAST({v!r} AS FLOAT)" for v in vec) + "]"
    got = con.execute(
        f"""
        WITH t AS (SELECT {lit} AS e),
        m AS (SELECT e, GREATEST(list_max(list_transform(e,
                x -> abs(CAST(x AS DOUBLE)))), CAST(1e-30 AS DOUBLE)) AS ma FROM t)
        SELECT list_transform(range(1, 5), i ->
               CAST(FLOOR(CAST(e[i] AS DOUBLE) * 127.0 / ma + 0.5) AS BIGINT))
        FROM m
        """
    ).fetchone()[0]
    assert got == want


def test_int8_codes_within_range():
    """Quantized codes must stay inside int8 (the storage contract):
    |code| <= 127 for any vector (max element maps to exactly 127)."""
    con = duckdb.connect()
    rows = con.execute(
        """
        WITH t AS (
          SELECT list_transform(range(1, 65),
                 i -> CAST(sin(i * v) * v AS FLOAT)) AS e
          FROM (SELECT unnest(range(1, 40)) AS v)
        ),
        m AS (SELECT e, GREATEST(list_max(list_transform(e,
                x -> abs(CAST(x AS DOUBLE)))), CAST(1e-30 AS DOUBLE)) AS ma FROM t)
        SELECT MAX(list_max(list_transform(range(1, 65), i ->
               abs(CAST(FLOOR(CAST(e[i] AS DOUBLE) * 127.0 / ma + 0.5) AS BIGINT)))))
        FROM m
        """
    ).fetchone()
    assert rows[0] <= 127


def test_domain_cap_invariants():
    """<= cap docs per source, selection deterministic across calls,
    and the kept set is the md5-minimal prefix per source."""
    from duckdb_extension_clickhouse_native_spark.operators.sketches import (
        domain_cap_sql,
    )

    sf = "/root/testdata/sf0.01"
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    rows = con.execute(domain_cap_sql("duckdb", cap=10)).fetchall()
    rows2 = con.execute(domain_cap_sql("duckdb", cap=10)).fetchall()
    assert rows == rows2
    from collections import Counter

    per_src = Counter(src for _d, src, _r in rows)
    assert all(c <= 10 for c in per_src.values())
    # every source with >= 10 docs contributes exactly 10
    totals = dict(
        con.execute("SELECT source, COUNT(*) FROM documents GROUP BY source").fetchall()
    )
    for src, tot in totals.items():
        assert per_src.get(src, 0) == min(10, tot)


def _greedy_chain_count(codes):
    f1 = f2 = f3 = 0
    for x in codes:
        if x == 1 and f1 < 1000:
            f1 += 1
        elif x == 2 and f1 > f2:
            f2 += 1
        elif x == 3 and f2 > f3:
            f3 += 1
    return f3


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),      # user
            st.sampled_from(["view", "click", "purchase", "signup"]),
        ),
        min_size=1,
        max_size=120,
    )
)
@settings(deadline=None, max_examples=50)
def test_sequence_count_oracle_equals_greedy_reference(rows):
    """The recursive-CTE oracle must equal the independent Python
    greedy counter for arbitrary event streams — including the many-
    rows-at-once shape that exposed the DuckDB 1.0 list_reduce fold
    bug (wrong value for a row inside a batch, correct alone)."""
    import pandas as pd

    from duckdb_extension_clickhouse_native_spark.operators.funnel import (
        sequence_count_sql,
    )

    df = pd.DataFrame(
        {
            "event_id": range(len(rows)),
            "user_id": [u for u, _ in rows],
            "event_type": [t for _, t in rows],
            "ts": pd.to_datetime("2024-01-01")
            + pd.to_timedelta([i % 7 for i in range(len(rows))], unit="s"),
            "value": 0.0,
            "props": "{}",
        }
    )
    con = duckdb.connect()
    con.register("events", df)
    got = dict(con.execute(sequence_count_sql("duckdb")).fetchall())
    code = {"view": 1, "click": 2, "purchase": 3, "signup": 0}
    per_user: dict = {}
    order = sorted(range(len(rows)), key=lambda i: (df["ts"][i], i))
    for i in order:
        u, t = rows[i]
        if t in ("view", "click", "purchase"):
            per_user.setdefault(u, []).append(code[t])
    want = {u: _greedy_chain_count(cs) for u, cs in per_user.items()}
    assert got == want


def test_sequence_count_spark_matches_oracle(spark):
    """Spark's packed-BIGINT aggregate fold == the recursive-CTE
    oracle, row-for-row at sf0.001 (the two implementations share no
    structure)."""
    from duckdb_extension_clickhouse_native_spark.operators.funnel import (
        sequence_count_sql,
    )
    from duckdb_extension_clickhouse_native_spark.plans.base import load_tables

    sf = "/root/testdata/sf0.001"
    load_tables(spark, sf, ["events"])
    got = [tuple(r) for r in spark.sql(sequence_count_sql("spark")).collect()]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')"
    )
    want = con.execute(sequence_count_sql("duckdb")).fetchall()
    assert got == want and len(got) > 0


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=20),              # key
            st.floats(min_value=0, max_value=50, width=32),      # weight >= 0
        ),
        min_size=1,
        max_size=300,
    ),
    st.integers(min_value=1, max_value=8),
    st.integers(min_value=2, max_value=25),
)
@settings(deadline=None, max_examples=100)
def test_weighted_candidates_are_superset(rows, m, batch_size):
    """Weighted pigeonhole: any key whose GLOBAL weight share exceeds
    1/(m+1) must clear the batch-local weight-share bar in at least
    one batch (non-negative weights)."""
    from collections import defaultdict

    batches = [rows[i : i + batch_size] for i in range(0, len(rows), batch_size)]
    cands = set()
    for b in batches:
        w = defaultdict(float)
        for k, v in b:
            w[k] += v
        tot = sum(v for _, v in b)
        for k, kw in w.items():
            if (tot > 0 and kw * (m + 1) > tot) or (tot == 0 and kw > 0):
                cands.add(k)
    gw = defaultdict(float)
    for k, v in rows:
        gw[k] += v
    gtot = sum(gw.values())
    heavy = {k for k, v in gw.items() if gtot > 0 and v * (m + 1) > gtot}
    assert heavy <= cands


def test_weighted_heavy_hitters_spark_matches_oracle(spark):
    from duckdb_extension_clickhouse_native_spark.operators.sketches import (
        heavy_hitters_weighted_oracle_sql,
        heavy_hitters_weighted_query,
    )

    sf = "/root/testdata/sf0.001"
    got = [tuple(r) for r in heavy_hitters_weighted_query(spark, sf).collect()]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')"
    )
    want = con.execute(heavy_hitters_weighted_oracle_sql()).fetchall()
    assert len(got) == len(want) > 0
    for (gu, gv), (wu, wv) in zip(got, want):
        assert gu == wu and abs(gv - wv) < 1e-9
