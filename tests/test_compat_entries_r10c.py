"""Hand-computed fixtures for the round-10 third-tranche entries:
stats_simple_linreg, agg_entropy_events, agg_sum_foreach,
events_group_bitmap, scalar_url_funcs, tf_numbers_range.

Each new registry entry gets a plain-Python / closed-form pin on a
fixture small enough to verify by hand, in addition to the DuckDB
oracle sweep — the repo's standard since r9 (template-level semantic
bugs cannot hide behind twin-SQL parity)."""

from __future__ import annotations

import datetime as dt
import math

import pandas as pd


def _registry():
    import __spark_entry__  # noqa: F401

    from duckdb_extension_clickhouse_native_spark.plans.base import REGISTRY

    return REGISTRY


def _events(rows):
    return pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )


def test_simple_linreg_hand_computed(spark, tmp_path):
    REGISTRY = _registry()
    d = str(tmp_path / "t")
    li = pd.DataFrame(
        [
            # flag A: y = 2x exactly -> slope 2, intercept 0
            ("A", 1.0, 2.0),
            ("A", 2.0, 4.0),
            ("A", 3.0, 6.0),
            # flag B: y = 2x + 1 exactly -> slope 2, intercept 1
            ("B", 1.0, 3.0),
            ("B", 2.0, 5.0),
            ("B", 4.0, 9.0),
        ],
        columns=["l_returnflag", "l_quantity", "l_extendedprice"],
    )
    spark.createDataFrame(li).write.parquet(d + "/lineitem.parquet")
    got = {
        r["l_returnflag"]: (r["slope"], r["intercept"], r["n_points"])
        for r in REGISTRY.all()["stats_simple_linreg"].build(spark, d).collect()
    }
    assert got == {"A": (2.0, 0.0, 3), "B": (2.0, 1.0, 3)}


def test_entropy_hand_computed(spark, tmp_path):
    REGISTRY = _registry()
    d = str(tmp_path / "t")
    base = dt.datetime(2024, 1, 1)
    ev = _events(
        # bucket 1 (user 1): a,a,b,b -> H = 1 bit exactly
        [(i, base, 1, t, 0.0, "{}") for i, t in enumerate(["a", "a", "b", "b"])]
        # bucket 2 (user 2): four of one type -> H = 0
        + [(10 + i, base, 2, "a", 0.0, "{}") for i in range(4)]
        # bucket 3 (users 3 and 13 share it): a,b,c,d -> H = 2 bits
        + [
            (20, base, 3, "a", 0.0, "{}"),
            (21, base, 3, "b", 0.0, "{}"),
            (22, base, 13, "c", 0.0, "{}"),
            (23, base, 13, "d", 0.0, "{}"),
        ]
        # bucket 4 (user 4): a,a,a,b -> H = -(3/4)log2(3/4) - (1/4)log2(1/4)
        + [(30 + i, base, 4, t, 0.0, "{}") for i, t in enumerate(["a", "a", "a", "b"])]
    )
    spark.createDataFrame(ev).write.parquet(d + "/events.parquet")
    got = {
        r["bucket"]: (r["ent"], r["n_events"])
        for r in REGISTRY.all()["agg_entropy_events"].build(spark, d).collect()
    }
    h4 = round(-(0.75 * math.log2(0.75) + 0.25 * math.log2(0.25)), 9)
    assert got == {1: (1.0, 4), 2: (0.0, 4), 3: (2.0, 4), 4: (h4, 4)}


def test_sum_foreach_hand_computed(spark, tmp_path):
    from pyspark.sql.types import (
        ArrayType,
        FloatType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    REGISTRY = _registry()
    d = str(tmp_path / "t")
    schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("embedding", ArrayType(FloatType())),
            StructField("label", IntegerType()),
        ]
    )
    rows = [
        (0, [1.0, 2.5], 0),  # grp 0
        (4, [0.5, -1.25], 0),  # grp 0 — negative checks FLOOR(x+0.5) rounding
        (1, [3.0, 4.0], 0),  # grp 1
    ]
    spark.createDataFrame(rows, schema).write.parquet(d + "/embeddings.parquet")
    got = {
        r["grp"]: (r["sums"], r["rows_per_elem"])
        for r in REGISTRY.all()["agg_sum_foreach"].build(spark, d).collect()
    }
    # grp 0: pos1 1.0+0.5 -> 1_500_000; pos2 2.5-1.25 -> 1_250_000
    # (-1.25 quantizes to floor(-1250000+0.5) = -1250000 exactly)
    assert got == {
        0: ("001:1500000,002:1250000", 2),
        1: ("001:3000000,002:4000000", 1),
    }


def test_group_bitmap_hand_computed(spark, tmp_path):
    REGISTRY = _registry()
    d = str(tmp_path / "t")
    base = dt.datetime(2024, 1, 1)
    ev = _events(
        [
            # u1: all three -> AND member
            (1, base, 1, "view", 0.0, "{}"),
            (2, base, 1, "click", 0.0, "{}"),
            (3, base, 1, "purchase", 0.0, "{}"),
            # u2: view only -> exactly-one
            (4, base, 2, "view", 0.0, "{}"),
            # u3: click + error (error doesn't count) -> exactly-one
            (5, base, 3, "click", 0.0, "{}"),
            (6, base, 3, "error", 0.0, "{}"),
            # u4: error only -> in none of the cardinalities
            (7, base, 4, "error", 0.0, "{}"),
            # u5: view + click (duplicated view) -> OR only
            (8, base, 5, "view", 0.0, "{}"),
            (9, base, 5, "view", 0.0, "{}"),
            (10, base, 5, "click", 0.0, "{}"),
        ]
    )
    spark.createDataFrame(ev).write.parquet(d + "/events.parquet")
    [r] = REGISTRY.all()["events_group_bitmap"].build(spark, d).collect()
    assert (r["and_card"], r["or_card"], r["exactly_one_card"]) == (1, 4, 2)


def test_url_funcs_hand_computed(spark, tmp_path):
    REGISTRY = _registry()
    d = str(tmp_path / "t")
    docs = pd.DataFrame(
        [(7, "text", "en", "srcA", 4)],
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    )
    spark.createDataFrame(docs).write.parquet(d + "/documents.parquet")
    [r] = REGISTRY.all()["scalar_url_funcs"].build(spark, d).collect()
    assert r.asDict() == {
        "doc_id": 7,
        "protocol": "https",
        "domain": "srcA.example.com",
        "url_path": "/docs/7",
        "query_string": "lang=en&ref=srcA",
        "lang_param": "en",
        "ref_param": "srcA",
    }


def test_numbers_range_closed_form(spark, tmp_path):
    import numpy as np

    REGISTRY = _registry()
    n = np.arange(1_000_000, dtype=np.int64)
    b = n % 7
    expected = {
        int(k): (
            int((b == k).sum()),
            int((n[b == k] ** 2).sum()),
            int(n[b == k].min()),
            int(n[b == k].max()),
        )
        for k in range(7)
    }
    got = {
        r["bucket"]: (r["cnt"], r["sum_sq"], r["mn"], r["mx"])
        for r in REGISTRY.all()["tf_numbers_range"]
        .build(spark, str(tmp_path))
        .collect()
    }
    assert got == expected


def test_join_any_left_dup_ties_and_orphan(spark, tmp_path):
    REGISTRY = _registry()
    d = str(tmp_path / "t")
    orders = pd.DataFrame(
        [(1, 400000.0), (2, 500000.0), (3, 100.0)],
        columns=["o_orderkey", "o_totalprice"],
    )
    li = pd.DataFrame(
        [
            # order 1: duplicate linenumber 1 -> lexicographic struct-min
            # must pick (1, 3.0, 2.0), not (1, 7.0, 9.0)
            (1, 2, 10.0, 5.0),
            (1, 1, 7.0, 9.0),
            (1, 1, 3.0, 2.0),
        ],
        columns=["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"],
    )
    spark.createDataFrame(orders).write.parquet(d + "/orders.parquet")
    spark.createDataFrame(li).write.parquet(d + "/lineitem.parquet")
    got = {
        r["o_orderkey"]: (r["any_linenumber"], r["any_qty"], r["any_price"])
        for r in REGISTRY.all()["join_any_left"].build(spark, d).collect()
    }
    # order 3 filtered (totalprice), order 2 keeps left row with NULLs
    assert got == {1: (1, 3.0, 2.0), 2: (None, None, None)}


def test_geo_distance_python_reference(spark, tmp_path):
    import math

    REGISTRY = _registry()
    d = str(tmp_path / "t")
    sup = pd.DataFrame([(80,), (240,), (3,)], columns=["s_suppkey"])
    spark.createDataFrame(sup).write.parquet(d + "/supplier.parquet")

    def ref(k):
        lat1 = (k % 160) - 80 + 0.5
        lon1 = ((k * 7) % 360) - 180 + 0.5
        lat2, lon2 = 48.8566, 2.3522
        h = (
            math.sin(math.radians(lat2 - lat1) / 2) ** 2
            + math.cos(math.radians(lat1))
            * math.cos(math.radians(lat2))
            * math.sin(math.radians(lon2 - lon1) / 2) ** 2
        )
        return round(2 * 6372797.560856 * math.asin(math.sqrt(h)), 3)

    got = {
        r["s_suppkey"]: r["dist_m"]
        for r in REGISTRY.all()["scalar_geo_funcs"].build(spark, d).collect()
    }
    assert got == {k: ref(k) for k in (80, 240, 3)}


def test_array_enumerate_uniq_hand_computed(spark, tmp_path):
    REGISTRY = _registry()
    d = str(tmp_path / "t")
    docs = pd.DataFrame(
        [(1, "A b a C b a", "en", "s", 11), (60, "never selected", "en", "s", 14)],
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    )
    spark.createDataFrame(docs).write.parquet(d + "/documents.parquet")
    got = {
        r["doc_id"]: r["enum_uniq"]
        for r in REGISTRY.all()["docs_array_enumerate_uniq"].build(spark, d).collect()
    }
    # lowercased: a b a c b a -> occurrence indices 1 1 2 1 2 3
    assert got == {1: "001:1,002:1,003:2,004:1,005:2,006:3"}


def test_window_value_functions_hand_computed(spark, tmp_path):
    REGISTRY = _registry()
    d = str(tmp_path / "t")
    base = dt.datetime(2024, 1, 1)
    ev = _events(
        [
            # user 1: ts tie between events 2 and 3 -> event_id breaks it;
            # only event 2 has value > 5, and it is NOT the last row ->
            # IGNORE NULLS must reach back past two trailing nulls
            (1, base, 1, "a", 1.0, "{}"),
            (2, base + dt.timedelta(seconds=1), 1, "b", 9.5, "{}"),
            (3, base + dt.timedelta(seconds=1), 1, "c", 2.0, "{}"),
            (4, base + dt.timedelta(seconds=2), 1, "d", 3.0, "{}"),
            # user 2: single event -> second_type NULL, last_big NULL
            (5, base, 2, "x", 1.0, "{}"),
        ]
    )
    spark.createDataFrame(ev).write.parquet(d + "/events.parquet")
    got = {
        r["user_id"]: (
            r["first_type"], r["last_type"], r["second_type"], r["last_big"]
        )
        for r in REGISTRY.all()["window_value_functions"].build(spark, d).collect()
    }
    assert got == {1: ("a", "d", "b", 9.5), 2: ("x", "x", None, None)}


def test_bit_funcs_hand_computed(spark, tmp_path):
    REGISTRY = _registry()
    d = str(tmp_path / "t")
    orders = pd.DataFrame([(0,), (45,), (1023,)], columns=["o_orderkey"])
    spark.createDataFrame(orders).write.parquet(d + "/orders.parquet")
    got = {
        r["o_orderkey"]: (r["popcnt"], r["shl"], r["shr"], r["bit5"], r["xored"])
        for r in REGISTRY.all()["scalar_bit_funcs"].build(spark, d).collect()
    }
    # 45 = 0b101101: popcount 4, (45%1024)<<3 = 360, 45>>4 = 2,
    # bit 5 = 1, 45^255 = 210; 1023 = ten ones
    assert got == {
        0: (0, 0, 0, 0, 255),
        45: (4, 360, 2, 1, 210),
        1023: (10, 8184, 63, 1, 768),
    }
