"""Hand-computed + plain-Python-reference pins for the r10 statistical
-test aggregates (mannWhitneyUTest / kolmogorovSmirnovTest /
welchTTest).  The MWU/KS entries already have structurally independent
oracles; these fixtures pin the SEMANTICS (tie corrections, exact
integer scaling, welch t) against references computed in this file."""

from __future__ import annotations

import datetime as dt
import math

import pandas as pd
import pytest


def _events_from_values(tmp_path, spark, clicks, purchases):
    d = str(tmp_path / "t")
    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for v in clicks:
        rows.append((eid, base, 1, "click", v, "{}"))
        eid += 1
    for v in purchases:
        rows.append((eid, base, 2, "purchase", v, "{}"))
        eid += 1
    # a decoy type that must be filtered out everywhere
    rows.append((eid, base, 3, "view", 99.99, "{}"))
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    spark.createDataFrame(pdf).write.parquet(d + "/events.parquet")
    return d


def _py_mwu(g1, g2):
    """Plain-Python tie-corrected Mann-Whitney: 2x-scaled rank sum of
    group 1 and 2*U1."""
    allv = sorted([(v, 1) for v in g1] + [(v, 2) for v in g2])
    # average rank per tied value, scaled by 2 to stay integer
    r1_x2 = 0
    i = 0
    while i < len(allv):
        j = i
        while j < len(allv) and allv[j][0] == allv[i][0]:
            j += 1
        # ranks i+1..j (1-based); avg*2 = (i+1 + j)
        avg2 = (i + 1) + j
        r1_x2 += avg2 * sum(1 for k in range(i, j) if allv[k][1] == 1)
        i = j
    n1 = len(g1)
    return r1_x2, r1_x2 - n1 * (n1 + 1)


def _py_ks(g1, g2):
    n1, n2 = len(g1), len(g2)
    vals = sorted(set(g1) | set(g2))
    best = 0
    for v in vals:
        f1 = sum(1 for x in g1 if x <= v)
        f2 = sum(1 for x in g2 if x <= v)
        best = max(best, abs(f1 * n2 - f2 * n1))
    return best, n1 * n2


def test_mwu_hand_computed_with_ties(spark, tmp_path):
    import __spark_entry__  # noqa: F401
    from duckdb_extension_clickhouse_native_spark.plans.base import REGISTRY

    clicks = [1.00, 2.00, 2.00, 5.00]      # cents: 100, 200, 200, 500
    purchases = [2.00, 3.00, 0.50]         # cents: 200, 300, 50
    d = _events_from_values(tmp_path, spark, clicks, purchases)
    row = REGISTRY.all()["stats_mann_whitney_u"].build(spark, d).collect()[0]
    c1 = [100, 200, 200, 500]
    c2 = [200, 300, 50]
    r1_x2, u1_x2 = _py_mwu(c1, c2)
    assert (row["n1"], row["n2"]) == (4, 3)
    assert row["r1_x2"] == r1_x2
    assert row["u1_x2"] == u1_x2


def test_ks_hand_computed(spark, tmp_path):
    import __spark_entry__  # noqa: F401
    from duckdb_extension_clickhouse_native_spark.plans.base import REGISTRY

    clicks = [1.00, 2.00, 4.00]
    purchases = [3.00, 3.00, 5.00, 6.00]
    d = _events_from_values(tmp_path, spark, clicks, purchases)
    row = REGISTRY.all()["stats_ks_distance"].build(spark, d).collect()[0]
    num, den = _py_ks([100, 200, 400], [300, 300, 500, 600])
    assert (row["n1"], row["n2"]) == (3, 4)
    assert row["d_num"] == num and row["d_den"] == den
    assert row["d_stat"] == pytest.approx(num / den)


def test_welch_hand_computed(spark, tmp_path):
    import __spark_entry__  # noqa: F401
    from duckdb_extension_clickhouse_native_spark.plans.base import REGISTRY

    clicks = [1.00, 2.00, 3.00]
    purchases = [4.00, 6.00]
    d = _events_from_values(tmp_path, spark, clicks, purchases)
    row = REGISTRY.all()["stats_welch_ttest"].build(spark, d).collect()[0]
    g1 = [100, 200, 300]
    g2 = [400, 600]
    assert (row["n1"], row["s1"], row["ss1"]) == (3, 600, 140000)
    assert (row["n2"], row["s2"], row["ss2"]) == (2, 1000, 520000)
    m1, m2 = 200.0, 500.0
    v1 = (140000 - 600 * 600 / 3) / 2   # 10000
    v2 = (520000 - 1000 * 1000 / 2) / 1  # 20000
    t = (m1 - m2) / math.sqrt(v1 / 3 + v2 / 2)
    assert row["t_stat"] == pytest.approx(round(t, 9))


def test_mwu_random_against_python_reference(spark, tmp_path):
    import random

    import __spark_entry__  # noqa: F401
    from duckdb_extension_clickhouse_native_spark.plans.base import REGISTRY

    rng = random.Random(11)
    clicks = [round(rng.uniform(0, 20), 2) for _ in range(60)]
    purchases = [round(rng.uniform(5, 25), 2) for _ in range(45)]
    d = _events_from_values(tmp_path, spark, clicks, purchases)
    row = REGISTRY.all()["stats_mann_whitney_u"].build(spark, d).collect()[0]
    c1 = [math.floor(v * 100) for v in clicks]
    c2 = [math.floor(v * 100) for v in purchases]
    r1_x2, u1_x2 = _py_mwu(c1, c2)
    assert row["r1_x2"] == r1_x2 and row["u1_x2"] == u1_x2
    krow = REGISTRY.all()["stats_ks_distance"].build(spark, d).collect()[0]
    num, den = _py_ks(c1, c2)
    assert krow["d_num"] == num and krow["d_den"] == den


def test_student_ttest_hand_computed(spark, tmp_path):
    """view group {1,2,3} (cents 100,200,300), signup group {2,4}
    (200,400): m1=200, m2=300, ss1=2e4, ss2=2e4, df=3,
    sp2=(2e4+2e4)/3, t=-100/sqrt(sp2*(1/3+1/2)) — by hand."""
    import math

    import pandas as pd

    import __spark_entry__  # noqa: F401
    from duckdb_extension_clickhouse_native_spark.plans.base import REGISTRY

    d = str(tmp_path / "t")
    base = dt.datetime(2024, 1, 1)
    rows = [
        (0, base, 1, "view", 1.0, "{}"),
        (1, base, 1, "view", 2.0, "{}"),
        (2, base, 1, "view", 3.0, "{}"),
        (3, base, 2, "signup", 2.0, "{}"),
        (4, base, 2, "signup", 4.0, "{}"),
        (5, base, 2, "click", 99.0, "{}"),  # excluded type
    ]
    ev = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    spark.createDataFrame(ev).write.parquet(d + "/events.parquet")
    [r] = REGISTRY.all()["stats_student_ttest"].build(spark, d).collect()
    assert (r.n1, r.s1, r.ss1) == (3, 600, 140000)
    assert (r.n2, r.s2, r.ss2) == (2, 600, 200000)
    assert r.df == 3
    sp2 = (20000 + 20000) / 3
    t = (200 - 300) / math.sqrt(sp2 * (1 / 3 + 1 / 2))
    assert r.t_stat == round(t, 9)


def test_cramers_v_hand_computed(spark, tmp_path):
    """2x2 table [[20,10],[10,20]]: n=60, chi2 = 60*(1/30 * (400/30 +
    100/30 + 100/30 + 400/30)) - 60 = 60*1000/900*... computed
    directly: chi2 = n*sum(o^2/(rt*ct)) - n = 60*(400+100+100+400)/900
    - 60 = 66.666..-60 = 20/3; V = sqrt(chi2/(60*1)) = sqrt(1/9) = 1/3."""
    import __spark_entry__  # noqa: F401
    from duckdb_extension_clickhouse_native_spark.plans.base import REGISTRY

    d = str(tmp_path / "t")
    rows = (
        [("F", "1-URGENT")] * 20
        + [("F", "2-HIGH")] * 10
        + [("O", "1-URGENT")] * 10
        + [("O", "2-HIGH")] * 20
    )
    od = pd.DataFrame(
        [(i, s, p) for i, (s, p) in enumerate(rows)],
        columns=["o_orderkey", "o_orderstatus", "o_orderpriority"],
    )
    spark.createDataFrame(od).write.parquet(d + "/orders.parquet")
    [r] = REGISTRY.all()["stats_cramers_v"].build(spark, d).collect()
    assert (r.n, r.r, r.c) == (60, 2, 2)
    assert r.chi2 == round(20 / 3, 9)
    assert r.v == round(1 / 3, 9)


def _ref_auc(pairs):
    """Average-rank AUC, plain python: pairs = [(score, label)]."""
    pos = [s for s, y in pairs if y]
    neg = [s for s, y in pairs if not y]
    if not pos or not neg:
        return None
    num = 0.0
    for a in pos:
        for b in neg:
            num += 1.0 if a > b else (0.5 if a == b else 0.0)
    return num / (len(pos) * len(neg))


def test_roc_auc_hand_computed(spark, tmp_path):
    """scores cents (300,200,200,100) labels (1,1,0,0):
    pairs: 300>200 ✓, 300>100 ✓, 200=200 half, 200>100 ✓ ->
    AUC = 3.5/4."""
    import __spark_entry__  # noqa: F401
    from duckdb_extension_clickhouse_native_spark.plans.base import REGISTRY

    d = str(tmp_path / "t")
    base = dt.datetime(2024, 1, 1)
    ev = pd.DataFrame(
        [
            (0, base, 1, "purchase", 3.0, "{}"),
            (1, base, 1, "purchase", 2.0, "{}"),
            (2, base, 1, "view", 2.0, "{}"),
            (3, base, 1, "view", 1.0, "{}"),
        ],
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    spark.createDataFrame(ev).write.parquet(d + "/events.parquet")
    [r] = REGISTRY.all()["stats_roc_auc"].build(spark, d).collect()
    assert (r.p, r.neg) == (2, 2)
    assert r.two_u == 7  # 2 * (3.5)
    assert r.auc == round(3.5 / 4, 9)


def test_roc_auc_duck_form_matches_python_reference():
    """Random score/label corpora: the pairwise ORACLE formulation ==
    plain-python average-rank AUC (the Spark rank-sum form is graded
    against this oracle at three scales)."""
    import random

    import duckdb

    from duckdb_extension_clickhouse_native_spark.plans.stats import _AUC_DUCK

    random.seed(11)
    for _ in range(60):
        n = random.randint(2, 40)
        rows = [
            (
                i,
                random.randint(0, 8) / 4.0,  # coarse -> many ties
                "purchase" if random.random() < 0.4 else "view",
            )
            for i in range(n)
        ]
        if len({t for _, _, t in rows}) < 2:
            continue
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE raw(event_id BIGINT, value DOUBLE, event_type VARCHAR)"
        )
        con.executemany("INSERT INTO raw VALUES (?,?,?)", rows)
        con.execute(
            "CREATE VIEW events AS SELECT event_id, value, event_type FROM raw"
        )
        [(p, neg, two_u, auc)] = con.execute(_AUC_DUCK).fetchall()
        ref = _ref_auc(
            [(int(v * 100 // 1), t == "purchase") for _, v, t in rows]
        )
        assert abs(auc - round(ref, 9)) < 1e-12, (rows, auc, ref)


def test_spearman_hand_computed(spark, tmp_path):
    """a = (1,2,3,3), b = (10,20,15,30): avg ranks (1,2,3.5,3.5) vs
    (1,3,2,4); Pearson of ranks = 3/sqrt(4.5*5) = 0.6324555...;
    d2 = sum(2ra-2rb)^2 = 0+4+9+1 = 14 (by hand)."""
    import __spark_entry__  # noqa: F401
    from duckdb_extension_clickhouse_native_spark.plans.base import REGISTRY

    d = str(tmp_path / "t")
    li = pd.DataFrame(
        [(1.0, 10.0), (2.0, 20.0), (3.0, 15.0), (3.0, 30.0)],
        columns=["l_quantity", "l_extendedprice"],
    )
    spark.createDataFrame(li).write.parquet(d + "/lineitem.parquet")
    [r] = REGISTRY.all()["stats_spearman_corr"].build(spark, d).collect()
    assert r.n == 4
    assert r.d2 == "14"  # exact digit string (driver-safe type)
    assert r.rho == round(3 / math.sqrt(4.5 * 5.0), 9)
