"""Property-based tests for the round-2 SQL primitives, driven through
DuckDB (both dialect variants where the Spark text is DuckDB-parsable,
else the DuckDB text) so hypothesis can run hundreds of corpora without
a Spark session. The Spark-vs-DuckDB agreement of the SAME generators
is covered separately by the oracle sweep; these pin the algebraic
invariants on arbitrary inputs.
"""

from __future__ import annotations

import duckdb
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from duckdb_extension_clickhouse_native_spark.operators.retrieval import (
    mixture_sample_sql,
)
from duckdb_extension_clickhouse_native_spark.operators.sharding import (
    shard_assign_sql,
)


def _docs_table(doc_ids, n_tokens_each, sources):
    texts = ["tok " * n for n in n_tokens_each]
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "text": [t.strip() for t in texts],
            "lang": ["en"] * len(doc_ids),
            "source": sources,
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )


corpus = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=10**9),  # doc_id
        st.integers(min_value=1, max_value=30),  # tokens
        st.sampled_from(["a", "b", "c"]),  # source
    ),
    min_size=1,
    max_size=120,
    unique_by=lambda t: t[0],
)


@given(corpus, st.integers(min_value=1, max_value=17))
@settings(deadline=None, max_examples=60)
def test_two_phase_rank_equals_naive(rows, shard_docs):
    """The distributed two-phase global rank partitions the corpus into
    exactly the shards the naive single-window form produces, for any
    doc-id set and shard size."""
    t = _docs_table(
        [r[0] for r in rows], [r[1] for r in rows], [r[2] for r in rows]
    )
    con = duckdb.connect()
    con.register("documents", t)
    two = con.execute(
        shard_assign_sql("duckdb", shard_docs=shard_docs, two_phase=True)
        + " ORDER BY shard_id"
    ).fetchall()
    naive = con.execute(
        shard_assign_sql("duckdb", shard_docs=shard_docs, two_phase=False)
        + " ORDER BY shard_id"
    ).fetchall()
    assert two == naive
    # exact sizes: every shard is full except possibly the last
    n = len(rows)
    sizes = [r[1] for r in two]
    assert sum(sizes) == n
    assert all(s == shard_docs for s in sizes[:-1])


@given(corpus, st.integers(min_value=1, max_value=100))
@settings(deadline=None, max_examples=60)
def test_mixture_quota_invariants(rows, target_pct):
    """Quotas never exceed source size, are at least 1 per source, and
    the selection picks exactly quota docs per source."""
    t = _docs_table(
        [r[0] for r in rows], [r[1] for r in rows], [r[2] for r in rows]
    )
    con = duckdb.connect()
    con.register("documents", t)
    sel = con.execute(
        "SELECT source, quota, COUNT(*) FROM ("
        + mixture_sample_sql("duckdb", target_pct=target_pct)
        + ") GROUP BY source, quota"
    ).fetchall()
    per_source = {}
    for r in rows:
        per_source[r[2]] = per_source.get(r[2], 0) + 1
    assert sel, "at least one source selected"
    for source, quota, n_sel in sel:
        assert 1 <= quota <= per_source[source]
        assert n_sel == quota


def test_importance_select_prefers_target_like_docs():
    """A candidate doc written in the target corpus's vocabulary must
    outrank one sharing no tokens with the target, and target docs
    themselves never appear in the selection."""
    from duckdb_extension_clickhouse_native_spark.operators.retrieval import (
        importance_select_sql,
    )

    target_docs = ["alpha beta gamma delta"] * 5
    like_target = "alpha beta alpha gamma"
    unlike_target = "zeta eta theta iota"
    doc_ids = list(range(7))
    texts = target_docs + [like_target, unlike_target]
    sources = ["src0"] * 5 + ["web", "web"]
    t = _docs_table(doc_ids, [4] * 7, sources)
    t = t.set_column(1, "text", pa.array(texts))
    con = duckdb.connect()
    con.register("documents", t)
    rows = con.execute(
        importance_select_sql("duckdb", top_n=10) + ""
    ).fetchall()
    got = {r[0]: r[1] for r in rows}
    assert set(got) == {5, 6}, "only non-target docs are selectable"
    assert got[5] > got[6], "target-vocabulary doc must score higher"


def _spans_reference(texts: dict, w: int):
    """Independent pure-Python implementation of duplicated-substring
    spans: w-gram occurrences, duplicated grams, per-doc islands."""
    from collections import Counter, defaultdict

    occ = defaultdict(list)  # doc_id -> [start...]
    counts = Counter()
    grams = {}
    for doc_id, text in texts.items():
        tk = text.split(" ")
        grams[doc_id] = [
            (i + 1, " ".join(tk[i : i + w])) for i in range(len(tk) - w + 1)
        ]
        for _s, g in grams[doc_id]:
            counts[g] += 1
    out = []
    for doc_id, gs in grams.items():
        starts = sorted(s for s, g in gs if counts[g] > 1)
        if not starts:
            continue
        run = [starts[0]]
        for s in starts[1:]:
            if s == run[-1] + 1:
                run.append(s)
            else:
                out.append((doc_id, run[0], run[-1] + w - 1, run[-1] + w - run[0], len(run)))
                run = [s]
        out.append((doc_id, run[0], run[-1] + w - 1, run[-1] + w - run[0], len(run)))
    return sorted(out)


# small token alphabet + short docs => real collisions at tiny w
span_corpus = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=10**6),  # doc_id
        st.lists(
            st.sampled_from(["x", "y", "z", "w0", "q"]),
            min_size=1,
            max_size=12,
        ),
    ),
    min_size=1,
    max_size=40,
    unique_by=lambda t: t[0],
)


@given(span_corpus, st.integers(min_value=1, max_value=4))
@settings(deadline=None, max_examples=80)
def test_substring_spans_equal_reference(rows, w):
    """The SQL duplicated-span query (DuckDB dialect — the oracle the
    driver hashes) agrees exactly with an independent Python
    implementation for arbitrary corpora and window sizes, including
    docs shorter than the window and intra-doc repeats."""
    from duckdb_extension_clickhouse_native_spark.operators.dedup import (
        substring_spans_sql,
    )

    texts = {doc_id: " ".join(toks) for doc_id, toks in rows}
    t = pa.table(
        {
            "doc_id": pa.array(list(texts), pa.int64()),
            "text": list(texts.values()),
        }
    )
    con = duckdb.connect()
    con.register("documents", t)
    got = sorted(tuple(r) for r in con.execute(substring_spans_sql("duckdb", w=w)).fetchall())
    assert got == _spans_reference(texts, w)


word = st.text(alphabet="abcdefg", min_size=1, max_size=4)
free_corpus = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=10**6),  # doc_id
        st.lists(word, min_size=1, max_size=25),  # tokens
    ),
    min_size=1,
    max_size=60,
    unique_by=lambda t: t[0],
)


def _free_docs_table(rows):
    texts = [" ".join(toks) for _id, toks in rows]
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": texts,
            "lang": ["en"] * len(rows),
            "source": ["a"] * len(rows),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )


@given(free_corpus, st.integers(min_value=1, max_value=40))
@settings(deadline=None, max_examples=50)
def test_weighted_sample_equals_reference(rows, k):
    """The SQL priority sample is exactly the k smallest md5-priority
    keys computed by an independent Python implementation, for any
    corpus and k."""
    import hashlib

    from duckdb_extension_clickhouse_native_spark.operators.retrieval import (
        weighted_sample_sql,
    )

    con = duckdb.connect()
    con.register("documents", _free_docs_table(rows))
    got = con.execute(weighted_sample_sql("duckdb", k=k)).fetchall()

    def prio(doc_id, n_tok):
        h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16)
        return (h + 1) / 1152921504606846976.0 / n_tok

    expect = sorted(
        ((did, len(toks), prio(did, len(toks))) for did, toks in rows),
        key=lambda x: (x[2], x[0]),
    )[:k]
    assert [(g[0], g[1]) for g in got] == [(e[0], e[1]) for e in expect]
    for g, e in zip(got, expect):
        assert abs(g[2] - e[2]) <= 1e-18 * max(1.0, abs(e[2]))


@given(free_corpus)
@settings(deadline=None, max_examples=30)
def test_quality_classifier_equals_reference(rows):
    """Bucket hashing + weight derivation + integer score vs a plain
    Python recomputation, on arbitrary corpora (the fixed-corpus Spark
    variant lives in test_operators)."""
    import hashlib

    from duckdb_extension_clickhouse_native_spark.functions.text import (
        quality_classifier_sql,
    )

    con = duckdb.connect()
    con.register("documents", _free_docs_table(rows))
    got = {
        r[0]: (r[1], r[2])
        for r in con.execute(quality_classifier_sql("duckdb")).fetchall()
    }

    def h15(sx):
        return int(hashlib.md5(sx.encode()).hexdigest()[:15], 16)

    for did, toks in rows:
        feats = list(toks) + [
            f"{toks[i]} {toks[i+1]}" for i in range(len(toks) - 1)
        ]
        fp = sum(h15(f"w#{h15(f) % 4096}") % 2001 - 1000 for f in feats)
        assert got[did] == (len(feats), fp), did


@given(free_corpus)
@settings(deadline=None, max_examples=20)
def test_tfidf_cosine_bounds(rows):
    """Cosine scores stay in [0, 1] + rounding slack and the result is
    exactly the docs containing >= 1 query term (others have zero dot
    and are absent), capped at top_k."""
    from duckdb_extension_clickhouse_native_spark.operators.retrieval import (
        DEFAULT_TERMS,
        tfidf_cosine_sql,
    )

    # make some docs contain query terms
    rows = [
        (did, toks + [DEFAULT_TERMS[did % len(DEFAULT_TERMS)]])
        if did % 3 == 0
        else (did, toks)
        for did, toks in rows
    ]
    con = duckdb.connect()
    con.register("documents", _free_docs_table(rows))
    got = con.execute(tfidf_cosine_sql("duckdb", top_k=1000)).fetchall()
    hit_docs = {
        did for did, toks in rows if any(t in toks for t in DEFAULT_TERMS)
    }
    assert {g[0] for g in got} == hit_docs
    for _did, score in got:
        assert -1e-6 <= score <= 1.0 + 1e-6


events_corpus = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),  # user
        st.integers(min_value=0, max_value=500),  # t (us)
        st.sampled_from(["view", "click", "purchase", "error"]),
    ),
    min_size=1,
    max_size=40,
)


@given(events_corpus, st.integers(min_value=1, max_value=200))
@settings(deadline=None, max_examples=60)
def test_window_funnel_equals_bruteforce(rows, window_us):
    """The greedy running-MAX funnel DP equals the exponential
    brute-force (try every strictly-ordered chain) on arbitrary event
    sets — the dominance argument, checked."""
    from itertools import combinations

    import pandas as pd

    from duckdb_extension_clickhouse_native_spark.operators.funnel import (
        FUNNEL_CHAIN,
        window_funnel_sql,
    )

    pdf = pd.DataFrame(
        {
            "event_id": range(len(rows)),
            "ts": pd.to_datetime(
                [t * 1000 for _u, t, _ty in rows], unit="us"
            ),
            "user_id": [u for u, _t, _ty in rows],
            "event_type": [ty for _u, _t, ty in rows],
            "value": 0.0,
            "props": "{}",
        }
    )
    con = duckdb.connect()
    con.register("events", pdf)
    got = dict(
        (r[0], r[1])
        for r in con.execute(
            window_funnel_sql("duckdb", window_us=window_us * 1000)
        ).fetchall()
    )

    by_user: dict = {}
    for i, (u, t, ty) in enumerate(rows):
        by_user.setdefault(u, []).append((t * 1000, i, ty))
    for u, evs in by_user.items():
        evs = sorted(evs)
        best = 0
        for k in range(len(FUNNEL_CHAIN), 0, -1):
            found = False
            for combo in combinations(range(len(evs)), k):
                if all(
                    evs[i][2] == FUNNEL_CHAIN[j]
                    for j, i in enumerate(combo)
                ) and evs[combo[-1]][0] - evs[combo[0]][0] <= window_us * 1000:
                    found = True
                    break
            if found:
                best = k
                break
        if any(ty in FUNNEL_CHAIN for _t, _i, ty in evs):
            assert got[u] == best, (u, evs, got[u], best)


@given(events_corpus)
@settings(deadline=None, max_examples=40)
def test_retention_invariants(rows):
    """Day-0 retention counts every cohort member exactly once, and no
    offset ever exceeds its cohort's day-0 count."""
    import pandas as pd

    from duckdb_extension_clickhouse_native_spark.operators.funnel import (
        retention_sql,
    )

    pdf = pd.DataFrame(
        {
            "event_id": range(len(rows)),
            "ts": pd.to_datetime(
                [t * 86400_000_000 + u for u, t, _ty in rows], unit="us"
            ),
            "user_id": [u for u, _t, _ty in rows],
            "event_type": [ty for _u, _t, ty in rows],
            "value": 0.0,
            "props": "{}",
        }
    )
    con = duckdb.connect()
    con.register("events", pdf)
    got = con.execute(retention_sql("duckdb", max_offset=10**6)).fetchall()
    day0 = {c: n for c, off, n in got if off == 0}
    cohort_sizes: dict = {}
    first_day = {}
    for u, t, _ty in rows:
        first_day[u] = min(first_day.get(u, t), t)
    for u, d in first_day.items():
        cohort_sizes[d] = cohort_sizes.get(d, 0) + 1
    assert day0 == cohort_sizes
    for c, _off, n in got:
        assert n <= day0[c]


@given(
    st.lists(st.integers(min_value=0, max_value=10**6), min_size=1, max_size=200, unique=True),
    st.lists(st.integers(min_value=0, max_value=10**6), min_size=0, max_size=30, unique=True),
)
@settings(deadline=None, max_examples=40)
def test_bloom_prefilter_never_drops_members(order_keys, segment):
    """The bloom pass must have NO false negatives (a dropped true
    member would corrupt the exact result): for arbitrary key sets the
    bloom form equals the plain semi-join, and every true member
    survives to the candidate set."""
    import pandas as pd

    from duckdb_extension_clickhouse_native_spark.operators.bloomjoin import (
        bloom_semijoin_sql,
    )

    cust = pd.DataFrame(
        {
            "c_custkey": segment + [10**7 + i for i in range(3)],
            "c_name": "x",
            "c_nationkey": 1,
            "c_acctbal": 0.0,
            "c_mktsegment": ["AUTOMOBILE"] * len(segment) + ["MACHINERY"] * 3,
        }
    )
    # duplicate every third fact row: multiplicity must survive the
    # key-level bloom probe exactly (r7 review fix)
    order_keys = order_keys + order_keys[::3]
    orders = pd.DataFrame(
        {
            "o_orderkey": range(len(order_keys)),
            "o_custkey": order_keys,
            "o_orderstatus": "O",
            "o_totalprice": [float(k % 97) for k in order_keys],
            "o_orderdate": pd.Timestamp("2024-01-01"),
            "o_orderpriority": ["1-URGENT" if k % 2 else "5-LOW" for k in order_keys],
        }
    )
    con = duckdb.connect()
    con.register("customer", cust)
    con.register("orders", orders)
    got = con.execute(bloom_semijoin_sql("duckdb")).fetchall()
    want = con.execute(
        """
        SELECT o_orderpriority, COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price
        FROM orders
        WHERE o_custkey IN (
          SELECT c_custkey FROM customer
          WHERE c_mktsegment = 'AUTOMOBILE' AND c_nationkey < 5
        )
        GROUP BY o_orderpriority ORDER BY o_orderpriority
        """
    ).fetchall()
    assert got == want


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["A", "N", "R"]),
            st.integers(min_value=0, max_value=50),   # price (small domain -> ties)
            st.integers(min_value=1, max_value=9),    # weight
        ),
        min_size=1,
        max_size=120,
    )
)
@settings(deadline=None, max_examples=60)
def test_weighted_quantiles_equal_reference(rows):
    """Cumulative-weight crossing == an independent Python weighted
    quantile, including under heavy value ties (the tie-insensitivity
    argument, checked)."""
    import pandas as pd

    from duckdb_extension_clickhouse_native_spark.plans.stats import _WQ

    li = pd.DataFrame(
        {
            "l_returnflag": [r[0] for r in rows],
            "l_extendedprice": [float(r[1]) for r in rows],
            "l_quantity": [r[2] for r in rows],
        }
    )
    con = duckdb.connect()
    con.register("lineitem", li)
    got = {r[0]: r[1:] for r in con.execute(_WQ).fetchall()}

    for flag, g in li.groupby("l_returnflag"):
        g = g.sort_values(["l_extendedprice", "l_quantity"], kind="mergesort")
        cw = g["l_quantity"].cumsum()
        tw = int(g["l_quantity"].sum())
        def q(mult_num, mult_den):
            return float(
                g["l_extendedprice"][cw * mult_den >= mult_num * tw].iloc[0]
            )
        wp25, wmed, wp75, total = got[flag]
        assert total == tw
        assert wp25 == q(1, 4)
        assert wmed == q(1, 2)
        assert wp75 == q(3, 4)


@given(st.integers(min_value=2, max_value=97))
@settings(deadline=None, max_examples=25)
def test_agg_state_merge_any_split(mod):
    """Partial-state merge must equal the full recompute for ANY
    deterministic base/delta split of the corpus."""
    from duckdb_extension_clickhouse_native_spark.plans.stats import (
        AGG_STATE_FULL_ORACLE,
        agg_state_merge_sql,
    )

    con = duckdb.connect()
    con.execute(
        "CREATE OR REPLACE VIEW events AS "
        "SELECT * FROM '/root/testdata/sf0.001/events.parquet'"
    )
    assert (
        con.execute(agg_state_merge_sql(mod)).fetchall()
        == con.execute(AGG_STATE_FULL_ORACLE).fetchall()
    )
