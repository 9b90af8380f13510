"""Hand-computed hostile fixtures for the five entries whose r9
correctness evidence was an identical-text oracle (r9 verdict #1):
events_limit_by, events_running_difference, weighted_percentiles_price,
lateral_topn_per_customer, group_order_by_all.  Each fixture is small
enough to verify by hand and exercises the arms the corpus data may
never hit (ties, single-member groups, exact quantile boundaries,
fewer-than-N groups)."""

from __future__ import annotations

import datetime as dt

import pandas as pd


def _events(rows):
    return pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )


def test_limit_by_ties_and_short_groups(spark, tmp_path):
    import __spark_entry__  # noqa: F401
    from duckdb_extension_clickhouse_native_spark.plans.base import REGISTRY

    d = str(tmp_path / "t")
    base = dt.datetime(2024, 1, 1)
    # user 1: 5 events, two with the SAME ts (order falls to event_id);
    # user 2: only 2 events (shorter than the limit)
    ev = _events(
        [
            (5, base, 1, "a", 0.0, "{}"),               # tie on ts with 3
            (3, base, 1, "a", 0.0, "{}"),               # wins tie (id 3 < 5)
            (7, base + dt.timedelta(seconds=1), 1, "a", 0.0, "{}"),
            (9, base + dt.timedelta(seconds=2), 1, "a", 0.0, "{}"),  # cut
            (1, base + dt.timedelta(seconds=3), 1, "a", 0.0, "{}"),  # cut
            (2, base, 2, "b", 0.0, "{}"),
            (4, base + dt.timedelta(seconds=1), 2, "b", 0.0, "{}"),
        ]
    )
    spark.createDataFrame(ev).write.parquet(d + "/events.parquet")
    rows = [
        (r["user_id"], r["event_id"])
        for r in REGISTRY.all()["events_limit_by"].build(spark, d).collect()
    ]
    # user 1 first-3 in (ts, event_id): 3, 5, 7 (output re-sorted by id);
    # user 2 keeps both
    assert rows == [(1, 3), (1, 5), (1, 7), (2, 2), (2, 4)]


def test_running_difference_negatives_and_singleton(spark, tmp_path):
    import __spark_entry__  # noqa: F401
    from duckdb_extension_clickhouse_native_spark.plans.base import REGISTRY

    d = str(tmp_path / "t")
    base = dt.datetime(2024, 1, 1)
    ev = _events(
        [
            (1, base, 1, "a", 5.00, "{}"),
            (2, base + dt.timedelta(seconds=1), 1, "a", 2.25, "{}"),  # -275
            (3, base + dt.timedelta(seconds=2), 1, "a", 2.25, "{}"),  # 0
            (4, base, 2, "a", 9.99, "{}"),  # singleton -> NULL delta
            # user 3: ts tie -> order by event_id (6 before 7)
            (6, base, 3, "a", 1.00, "{}"),
            (7, base, 3, "a", 4.00, "{}"),  # +300
        ]
    )
    spark.createDataFrame(ev).write.parquet(d + "/events.parquet")
    got = {
        r["event_id"]: r["delta_cents"]
        for r in REGISTRY.all()["events_running_difference"].build(spark, d).collect()
    }
    assert got == {1: None, 2: -275, 3: 0, 4: None, 6: None, 7: 300}


def test_weighted_percentiles_hand_computed(spark, tmp_path):
    import __spark_entry__  # noqa: F401
    from duckdb_extension_clickhouse_native_spark.plans.base import REGISTRY

    d = str(tmp_path / "t")
    # flag A: prices 10(w1) 20(w2) 30(w1) -> tw=4, cum: 10->1 20->3 30->4
    #   p25: first cw*4>=4  -> 10 ; median: first cw*2>=4 (cw>=2) -> 20
    #   p75: first cw*4>=12 (cw>=3) -> 20
    # flag R: single row price 7 weight 5 -> all quantiles 7
    li = pd.DataFrame(
        {
            "l_returnflag": ["A", "A", "A", "R"],
            "l_extendedprice": [10.0, 20.0, 30.0, 7.0],
            "l_quantity": [1.0, 2.0, 1.0, 5.0],
        }
    )
    spark.createDataFrame(li).write.parquet(d + "/lineitem.parquet")
    got = {
        r["l_returnflag"]: (r["wp25"], r["wmedian"], r["wp75"], r["total_weight"])
        for r in REGISTRY.all()["weighted_percentiles_price"].build(spark, d).collect()
    }
    assert got == {"A": (10.0, 20.0, 20.0, 4), "R": (7.0, 7.0, 7.0, 5)}


def test_lateral_topn_short_customers_and_date_ties(spark, tmp_path):
    import __spark_entry__  # noqa: F401
    from duckdb_extension_clickhouse_native_spark.plans.base import REGISTRY

    d = str(tmp_path / "t")
    cust = pd.DataFrame(
        {
            "c_custkey": [1, 2, 3],
            "c_name": ["x", "y", "z"],
            "c_acctbal": [300.0, 200.0, 100.0],
        }
    )
    day = dt.date(2024, 1, 1)
    orders = pd.DataFrame(
        {
            # cust 1: 4 orders, two on the SAME date (tie -> orderkey
            # DESC); cust 2: 1 order; cust 3: none
            "o_orderkey": [10, 11, 12, 13, 20],
            "o_custkey": [1, 1, 1, 1, 2],
            "o_orderdate": [
                day,
                day + dt.timedelta(days=1),
                day + dt.timedelta(days=1),
                day + dt.timedelta(days=2),
                day,
            ],
            "o_totalprice": [1.0, 2.0, 3.0, 4.0, 5.0],
        }
    )
    spark.createDataFrame(cust).write.parquet(d + "/customer.parquet")
    spark.createDataFrame(orders).write.parquet(d + "/orders.parquet")
    rows = [
        (r["c_custkey"], r["o_orderkey"])
        for r in REGISTRY.all()["lateral_topn_per_customer"].build(spark, d).collect()
    ]
    # cust 1 top-3 by (date DESC, key DESC): 13, then 12, 11 (same date,
    # key desc) -> order 10 dropped; cust 2 keeps its single order;
    # cust 3 contributes nothing (dependent join, not LEFT)
    assert rows == [(1, 11), (1, 12), (1, 13), (2, 20)]


def test_group_order_by_all_hand_computed(spark, tmp_path):
    import __spark_entry__  # noqa: F401
    from duckdb_extension_clickhouse_native_spark.plans.base import REGISTRY

    d = str(tmp_path / "t")
    orders = pd.DataFrame(
        {
            "o_orderkey": [1, 2, 3, 4, 5],
            "o_orderpriority": ["1-URGENT", "1-URGENT", "2-HIGH", "2-HIGH", "2-HIGH"],
            "o_orderstatus": ["O", "F", "O", "O", "F"],
            "o_totalprice": [150000.0, 200000.25, 120000.5, 99999.99, 130000.0],
        }
    )
    spark.createDataFrame(orders).write.parquet(d + "/orders.parquet")
    rows = [
        tuple(r)
        for r in REGISTRY.all()["group_order_by_all"].build(spark, d).collect()
    ]
    # filter drops orderkey 4 (99999.99 <= 100000); groups:
    # (1-URGENT,F): n=1, 20000025 ; (1-URGENT,O): n=1, 15000000
    # (2-HIGH,F):   n=1, 13000000 ; (2-HIGH,O):  n=1, 12000050
    # ORDER BY ALL: priority, status, n, cents
    assert rows == [
        ("1-URGENT", "F", 1, 20000025),
        ("1-URGENT", "O", 1, 15000000),
        ("2-HIGH", "F", 1, 13000000),
        ("2-HIGH", "O", 1, 12000050),
    ]
