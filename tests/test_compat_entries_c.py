"""Batch-C compat entries (PASTE JOIN / boundingRatio / avgWeighted)
on the arms the graded fixture cannot pin: unequal-side positional
truncation, the single-point NULL-slope arm, and a hand-computed
weighted mean."""

from __future__ import annotations

import datetime as dt

import pandas as pd


def test_paste_join_truncates_to_shorter_side(spark, tmp_path):
    import __spark_entry__  # noqa: F401
    from duckdb_extension_clickhouse_native_spark.plans.base import REGISTRY

    d = str(tmp_path / "t")
    # 3 customers' orders vs 5 parts' lineitems -> 3 positional rows
    orders = pd.DataFrame(
        {
            "o_orderkey": [1, 2, 3, 4],
            "o_custkey": [10, 10, 20, 30],
            "o_totalprice": [100.00, 50.00, 120.00, 120.00],
        }
    )
    lineitem = pd.DataFrame(
        {
            "l_orderkey": [1, 1, 2, 3, 4],
            "l_partkey": [7, 8, 9, 10, 11],
            "l_quantity": [5.0, 4.0, 3.0, 2.0, 1.0],
        }
    )
    spark.createDataFrame(orders).write.parquet(d + "/orders.parquet")
    spark.createDataFrame(lineitem).write.parquet(d + "/lineitem.parquet")

    rows = [
        tuple(r)
        for r in REGISTRY.all()["join_paste_leaderboards"].build(spark, d).collect()
    ]
    # spend: cust10=15000, cust20=12000, cust30=12000 (tie -> custkey)
    # parts by qty: 7(5),8(4),9(3) paired positionally; parts 10,11 dropped
    assert rows == [
        (1, 10, 15000, 7, 5),
        (2, 20, 12000, 8, 4),
        (3, 30, 12000, 9, 3),
    ]


def test_bounding_ratio_null_arm_and_slope(spark, tmp_path):
    import __spark_entry__  # noqa: F401
    from duckdb_extension_clickhouse_native_spark.plans.base import REGISTRY

    d = str(tmp_path / "t")
    base = dt.datetime(2024, 1, 1)
    events = pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4],
            "ts": [
                base,
                base + dt.timedelta(seconds=10),
                base,  # user 2: single event -> NULL ratio
                base,  # user 3: tie ts with event 5 below
            ],
            "user_id": [1, 1, 2, 3],
            "event_type": ["a"] * 4,
            "value": [1.00, 3.50, 9.99, 2.00],
            "props": ["{}"] * 4,
        }
    )
    # user 3 second event: same second (t_last == t_first) -> NULL too
    events = pd.concat(
        [
            events,
            pd.DataFrame(
                {
                    "event_id": [5],
                    "ts": [base + dt.timedelta(microseconds=500)],
                    "user_id": [3],
                    "event_type": ["a"],
                    "value": [5.00],
                    "props": ["{}"],
                }
            ),
        ]
    )
    spark.createDataFrame(events).write.parquet(d + "/events.parquet")

    got = {
        r["user_id"]: (r["y_first"], r["y_last"], r["bounding_ratio"])
        for r in REGISTRY.all()["events_bounding_ratio"].build(spark, d).collect()
    }
    assert got[1] == (100, 350, 25.0)  # (350-100) cents / 10 s
    assert got[2][2] is None
    # user 3: both events land in the same integer second -> NULL, but
    # first/last still pinned by (ts, event_id)
    assert got[3] == (200, 500, None)


def test_avg_weighted_hand_computed(spark, tmp_path):
    import __spark_entry__  # noqa: F401
    from duckdb_extension_clickhouse_native_spark.plans.base import REGISTRY

    d = str(tmp_path / "t")
    lineitem = pd.DataFrame(
        {
            "l_returnflag": ["A", "A", "R"],
            "l_extendedprice": [10.00, 20.00, 5.00],
            "l_quantity": [1.0, 3.0, 2.0],
        }
    )
    spark.createDataFrame(lineitem).write.parquet(d + "/lineitem.parquet")
    got = {
        r["l_returnflag"]: (r["avg_weighted_price_cents"], r["total_weight"])
        for r in REGISTRY.all()["agg_avg_weighted"].build(spark, d).collect()
    }
    # A: (1000*1 + 2000*3)/4 = 1750 cents; R: 500*2/2 = 500
    assert got == {"A": (1750.0, 4), "R": (500.0, 2)}
