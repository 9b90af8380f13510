"""Hand-computed fixtures for the round-10 sixth-tranche entries:
text_multi_search, array_set_functions, scalar_encoding_funcs,
scalar_ip_funcs — plus the projection/optimize/columns entries'
semantics are pinned in tests/test_projections.py.

Each pin is an independently-derived expected value (by hand or by a
different algorithm), never the output of either engine."""

from __future__ import annotations

import pandas as pd


def _registry():
    import __spark_entry__  # noqa: F401

    from duckdb_extension_clickhouse_native_spark.plans.base import REGISTRY

    return REGISTRY


def _docs(rows):
    return pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )


def test_multi_search_hand_computed(spark, tmp_path):
    """Needles: ('data', 'vector', 'stream'). Tie rule: leftmost match
    wins; equal positions -> smallest needle index."""
    REGISTRY = _registry()
    d = str(tmp_path / "t")
    docs = _docs(
        [
            (1, "a data point", "en", "s", 12),  # only 'data' at 3
            (2, "vector then data", "en", "s", 16),  # vector@1 < data@13
            (3, "no match here", "en", "s", 13),  # none
            # 'datastream': data@1, stream@5 -> data (index 1) wins
            (4, "datastream", "en", "s", 10),
            # 'streamdata': stream@1 beats data@7 -> index 3
            (5, "streamdata", "en", "s", 10),
        ]
    )
    spark.createDataFrame(docs).write.parquet(d + "/documents.parquet")
    got = {
        r.doc_id: (r.any_match, r.first_index, r.first_position)
        for r in REGISTRY.all()["text_multi_search"].build(spark, d).collect()
    }
    assert got == {
        1: (1, 1, 3),
        2: (1, 2, 1),
        3: (0, 0, 0),
        4: (1, 1, 1),
        5: (1, 3, 1),
    }


def test_array_set_functions_hand_computed(spark, tmp_path):
    """n_compact collapses CONSECUTIVE runs only; n_uniq dedups
    globally — the fixture separates the two."""
    REGISTRY = _registry()
    d = str(tmp_path / "t")
    docs = _docs(
        [
            # tokens: [x, x, y, x] -> compact [x,y,x] (3), uniq 2,
            # inter with {data,the,value,vector} = 0,
            # union adds data+the -> {x,y,data,the} = 4
            (1, "x x y x", "en", "s", 7),
            # tokens: [data, data, the, vector] -> compact 3, uniq 3,
            # inter 3, union {data,the,vector} = 3
            (2, "data data the vector", "en", "s", 20),
            # single token -> all 1s except inter 0, union 3
            (3, "solo", "en", "s", 4),
        ]
    )
    spark.createDataFrame(docs).write.parquet(d + "/documents.parquet")
    got = {
        r.doc_id: (r.n_inter, r.n_union, r.n_uniq, r.n_compact)
        for r in REGISTRY.all()["array_set_functions"].build(spark, d).collect()
    }
    assert got == {
        1: (0, 4, 2, 3),
        2: (3, 3, 3, 3),
        3: (0, 3, 1, 1),
    }


def test_encoding_funcs_hand_computed(spark, tmp_path):
    """'hello world!' -> base64 aGVsbG8gd29ybGQh (RFC 4648 by hand);
    'hello wo' -> hex 68656C6C6F20776F."""
    REGISTRY = _registry()
    d = str(tmp_path / "t")
    docs = _docs([(1, "hello world! extra tail", "en", "s", 23)])
    spark.createDataFrame(docs).write.parquet(d + "/documents.parquet")
    [r] = REGISTRY.all()["scalar_encoding_funcs"].build(spark, d).collect()
    assert r.b64 == "aGVsbG8gd29ybGQh"
    assert r.hx == "68656C6C6F20776F"
    assert r.b64_roundtrip == 1 and r.hex_roundtrip == 1


def test_ip_funcs_hand_computed(spark, tmp_path):
    """Pick user_ids whose Knuth-hash addresses are known dotted quads,
    computed by hand from the byte layout (not by either engine)."""
    REGISTRY = _registry()
    d = str(tmp_path / "t")
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    users = [0, 1, 7, 123456]
    ev = pd.DataFrame(
        [(i, base, u, "view", 0.0, "{}") for i, u in enumerate(users)],
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    spark.createDataFrame(ev).write.parquet(d + "/events.parquet")
    got = {
        r.user_id: (r.ip, r.ip_str, r.roundtrip_ok, r.in_10_slash_8)
        for r in REGISTRY.all()["scalar_ip_funcs"].build(spark, d).collect()
    }

    def quad(ip):
        return ".".join(str((ip >> (8 * k)) & 255) for k in (3, 2, 1, 0))

    for u in users:
        ip = (u * 2654435761) % 2**32
        assert got[u] == (ip, quad(ip), 1, 1 if (ip >> 24) == 10 else 0)
    # user 0 -> 0.0.0.0 pins the all-zero octets rendering
    assert got[0][1] == "0.0.0.0"


def test_cumulative_uniques_hand_computed(spark, tmp_path):
    """3 days, overlapping users: day1 {1,2}, day2 {2,3}, day3 {1,4}.
    new_users = 2,1,1; cum = 2,3,4 (by hand)."""
    import datetime as dt

    REGISTRY = _registry()
    d = str(tmp_path / "t")
    mk = lambda day, u, i: (  # noqa: E731
        i, dt.datetime(2024, 1, day, 12, 0), u, "view", 0.0, "{}"
    )
    ev = pd.DataFrame(
        [
            mk(1, 1, 0), mk(1, 2, 1), mk(1, 2, 2),
            mk(2, 2, 3), mk(2, 3, 4),
            mk(3, 1, 5), mk(3, 4, 6),
        ],
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    spark.createDataFrame(ev).write.parquet(d + "/events.parquet")
    rows = (
        REGISTRY.all()["events_cumulative_uniques"].build(spark, d).collect()
    )
    got = [(r.day.isoformat(), r.new_users, r.cum_users) for r in rows]
    assert got == [
        ("2024-01-01", 2, 2),
        ("2024-01-02", 1, 3),
        ("2024-01-03", 1, 4),
    ]


def test_transform_func_hand_computed(spark, tmp_path):
    import datetime as dt

    REGISTRY = _registry()
    d = str(tmp_path / "t")
    base = dt.datetime(2024, 1, 1)
    ev = pd.DataFrame(
        [
            (0, base, 1, "view", 0.0, "{}"),
            (1, base, 1, "purchase", 0.0, "{}"),
            (2, base, 1, "signup", 0.0, "{}"),  # not in the map -> default
        ],
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    spark.createDataFrame(ev).write.parquet(d + "/events.parquet")
    got = {
        r.event_id: (r.code, r.weight)
        for r in REGISTRY.all()["scalar_transform_func"].build(spark, d).collect()
    }
    assert got == {0: ("V", 10), 1: ("P", 70), 2: ("-", 0)}


def test_vector_funcs_hand_computed(spark, tmp_path):
    """embedding (0.5, -1.25, 2.0) -> mils (500, -1250, 2000):
    dot_ones = 1250, norm2 = 5_812_500, cos = 1250/(sqrt(3)*sqrt(norm2))."""
    import math

    REGISTRY = _registry()
    d = str(tmp_path / "t")
    emb = pd.DataFrame(
        {"vec_id": [1], "embedding": [[0.5, -1.25, 2.0]], "label": [0]}
    )
    spark.createDataFrame(emb).write.parquet(d + "/embeddings.parquet")
    [r] = REGISTRY.all()["scalar_vector_funcs"].build(spark, d).collect()
    assert (r.dim, r.dot_ones, r.norm2) == (3, 1250, 5_812_500)
    assert r.cos_ones == round(1250 / (math.sqrt(3) * math.sqrt(5_812_500)), 9)


def test_quantile_exact_hand_computed(spark, tmp_path):
    """quantities 0.10..0.19 (cents 10..19, n=10): nearest-rank
    ceil(q*n) picks index 3,5,8,9 -> 12,14,17,18 (by hand)."""
    REGISTRY = _registry()
    d = str(tmp_path / "t")
    li = pd.DataFrame({"l_quantity": [0.10 + i / 100 for i in range(10)]})
    spark.createDataFrame(li).write.parquet(d + "/lineitem.parquet")
    [r] = REGISTRY.all()["quantile_exact_multi"].build(spark, d).collect()
    assert (r.q25, r.q50, r.q75, r.q90, r.n) == (12, 14, 17, 18, 10)


def test_format_datetime_hand_computed(spark, tmp_path):
    """ISO week-year corners by hand: 2023-01-01 is a Sunday ->
    ISO 2022-W52 dow 7; 2021-01-01 is a Friday -> ISO 2020-W53 dow 5;
    2024-01-01 is a Monday -> ISO 2024-W01 dow 1."""
    import datetime as dt

    REGISTRY = _registry()
    d = str(tmp_path / "t")
    ev = pd.DataFrame(
        [
            (0, dt.datetime(2023, 1, 1, 13, 5, 7), 1, "view", 0.0, "{}"),
            (1, dt.datetime(2021, 1, 1, 0, 0, 0), 1, "view", 0.0, "{}"),
            (2, dt.datetime(2024, 1, 1, 23, 59, 59), 1, "view", 0.0, "{}"),
        ],
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    spark.createDataFrame(ev).write.parquet(d + "/events.parquet")
    got = {
        r.event_id: (r.iso_full, r.iso_week, r.iso_dow, r.day_of_year,
                     r.with_literal)
        for r in REGISTRY.all()["scalar_format_datetime"].build(spark, d).collect()
    }
    assert got == {
        0: ("2023-01-01 13:05:07", "2022-52", 7, "001", "100% at 13:05"),
        1: ("2021-01-01 00:00:00", "2020-53", 5, "001", "100% at 00:00"),
        2: ("2024-01-01 23:59:59", "2024-01", 1, "001", "100% at 23:59"),
    }


def test_ch_format_rejects_unknown_specifier():
    import pytest

    from duckdb_extension_clickhouse_native_spark.functions.datetime import (
        format_datetime_expr,
    )

    with pytest.raises(ValueError, match="unsupported"):
        format_datetime_expr("ts", "%Q")
    with pytest.raises(ValueError, match="dangling"):
        format_datetime_expr("ts", "abc%")
