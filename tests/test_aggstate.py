"""AggregateFunction(f, T) state-blob codec (r15 fourth tranche —
closes VERDICT r14 "What's missing" item 4).

Layouts are clean-room re-expressions of ClickHouse's public
serialize() implementations (native/aggstate.py docstring cites them
per function); tests pin byte layouts, round-trips, skip-arm
consistency, the named refusals, and that merge+finalize over decoded
states equals a full Spark recompute.
"""

from __future__ import annotations

import io

import pyarrow as pa
import pytest

from duckdb_extension_clickhouse_native_spark.native.aggstate import (
    AggSpec,
    decode_states,
    encode_states,
    parse_agg_spec,
)
from duckdb_extension_clickhouse_native_spark.native.codec import (
    decode_column,
    encode_column,
    skip_column,
)
from duckdb_extension_clickhouse_native_spark.native.types import (
    UnsupportedTypeError,
    parse_type,
    to_arrow,
)


def _roundtrip(type_str, vals, arrow_override=None):
    t = parse_type(type_str)
    at = arrow_override or to_arrow(t)
    arr = pa.array(vals, type=at)
    buf = io.BytesIO()
    encode_column(buf, t, arr)
    raw = buf.getvalue()
    back = decode_column(io.BytesIO(raw), t, len(vals))
    # the skip arm must consume EXACTLY the same bytes
    b2 = io.BytesIO(raw)
    skip_column(b2, t, len(vals))
    assert b2.read() == b""
    return raw, back


# ---------------------------------------------------------------- layouts


def test_count_layout_is_varuint():
    raw, back = _roundtrip("AggregateFunction(count)", [0, 5, 300])
    # varuint: 0x00, 0x05, 0xAC 0x02
    assert raw == bytes([0x00, 0x05, 0xAC, 0x02])
    assert back.to_pylist() == [0, 5, 300]


def test_sum_widens_and_is_raw_le():
    raw, back = _roundtrip("AggregateFunction(sum, UInt8)", [7, 500])
    # accumulator UInt64 (NOT UInt8): 8 bytes per state
    assert raw == (7).to_bytes(8, "little") + (500).to_bytes(8, "little")
    assert back.to_pylist() == [7, 500]


def test_sum_with_overflow_keeps_narrow_type():
    raw, back = _roundtrip("AggregateFunction(sumWithOverflow, Int16)", [-3, 9])
    assert len(raw) == 4  # two Int16 states
    assert back.to_pylist() == [-3, 9]


def test_avg_layout_numerator_then_varuint_denominator():
    t = parse_type("AggregateFunction(avg, Int32)")
    arr = pa.array(
        [{"numerator": 10, "denominator": 300}], type=to_arrow(t)
    )
    buf = io.BytesIO()
    encode_column(buf, t, arr)
    raw = buf.getvalue()
    assert raw == (10).to_bytes(8, "little") + bytes([0xAC, 0x02])
    back = decode_column(io.BytesIO(raw), t, 1)
    assert back.to_pylist() == [{"numerator": 10, "denominator": 300}]


def test_single_value_fixed_has_flag():
    raw, back = _roundtrip("AggregateFunction(min, Int32)", [5, None])
    assert raw == b"\x01" + (5).to_bytes(4, "little") + b"\x00"
    assert back.to_pylist() == [5, None]


def test_single_value_string_int32_size():
    raw, back = _roundtrip("AggregateFunction(max, String)", ["ab", None, ""])
    assert raw == (
        (2).to_bytes(4, "little") + b"ab"
        + (-1).to_bytes(4, "little", signed=True)
        + (0).to_bytes(4, "little")
    )
    assert back.to_pylist() == ["ab", None, ""]


def test_uniq_exact_varuint_size_then_elements_sorted_on_decode():
    t = parse_type("AggregateFunction(uniqExact, Int32)")
    arr = pa.array([[3, 1, 2], []], type=to_arrow(t))
    buf = io.BytesIO()
    encode_column(buf, t, arr)
    raw = buf.getvalue()
    assert raw[0] == 3  # varuint set size
    back = decode_column(io.BytesIO(raw), t, 2)
    assert back.to_pylist() == [[1, 2, 3], []]  # sorted for determinism


def test_arg_max_pairs_result_then_comparison():
    raw, back = _roundtrip(
        "AggregateFunction(argMax, String, Int64)",
        [{"result": "a", "comparison": 9},
         {"result": None, "comparison": None}],
    )
    assert back.to_pylist() == [
        {"result": "a", "comparison": 9},
        {"result": None, "comparison": None},
    ]


def test_group_bit_or_raw_value():
    raw, back = _roundtrip("AggregateFunction(groupBitOr, UInt8)", [3, 12])
    assert raw == bytes([3, 12])
    assert back.to_pylist() == [3, 12]


def test_datetime_and_float_and_decimal_args():
    _raw, back = _roundtrip(
        "AggregateFunction(sum, Float32)", [1.5, -2.25]
    )
    assert back.to_pylist() == [1.5, -2.25]
    t = parse_type("AggregateFunction(min, DateTime)")
    assert to_arrow(t) == pa.timestamp("us")
    # sum over Decimal widens to Decimal(38, s): 16-byte states
    t2 = parse_type("AggregateFunction(sum, Decimal(12, 2))")
    assert to_arrow(t2) == pa.decimal128(38, 2)


# --------------------------------------------------------------- refusals


@pytest.mark.parametrize(
    "bad,frag",
    [
        ("AggregateFunction(uniq, String)", "not in the decodable family"),
        ("AggregateFunction(quantiles(0.5), Float64)", "parametrized"),
        ("AggregateFunction(sumIf, Int64, UInt8)", "not in the decodable"),
        ("AggregateFunction(uniqExact, String)", "sipHash"),
        ("AggregateFunction(sum)", "exactly one argument"),
        ("AggregateFunction(argMin, Int64)", "result, comparison"),
        ("AggregateFunction(sum, Nullable(Int64))", "Nullable"),
        ("AggregateFunction(groupBitAnd, Float64)", "integer argument"),
        ("Nullable(AggregateFunction(sum, UInt64))", "not a valid"),
        ("AggregateFunction", "needs (function, types"),
    ],
)
def test_named_refusals(bad, frag):
    with pytest.raises(UnsupportedTypeError, match="(?s)" + frag.replace(
        "(", "\\(").replace(")", "\\)")):
        parse_type(bad)


def test_compat_placeholder_mode_for_unsupported_function():
    t = parse_type("AggregateFunction(uniq, String)", unsupported_as_varchar=True)
    assert t.base == "Unsupported"
    # but the SUPPORTED family decodes even in compat mode
    t2 = parse_type("AggregateFunction(sum, UInt64)", unsupported_as_varchar=True)
    assert t2.base == "AggregateFunction"


def test_spec_parsing_case_insensitive_and_canonical():
    assert parse_agg_spec("ANYLAST, Int64").func == "anyLast"
    assert parse_agg_spec("count").func == "count"
    assert parse_agg_spec("count, UInt64").func == "count"


# ----------------------------------------------- merge/finalize vs Spark


def test_merge_finalize_equals_full_recompute(spark):
    """Partial states per chunk, merged + finalized in Spark == a full
    aggregate over the raw rows (the -Merge contract)."""
    import pyspark.sql.functions as F

    from duckdb_extension_clickhouse_native_spark.functions.aggstates import (
        finalize_agg_state,
        merge_agg_state,
    )

    rows = [(i % 4, i % 3, i, float(i) * 0.5, f"s{i % 7}") for i in range(500)]
    df = spark.createDataFrame(rows, "k int, chunk int, v long, f double, s string")
    # partial states per (k, chunk) — plain values, exactly the shapes
    # decode_states surfaces
    parts = df.groupBy("k", "chunk").agg(
        F.count("*").alias("cnt_st"),
        F.sum("v").alias("sum_st"),
        F.struct(
            F.sum("v").alias("numerator"), F.count("*").alias("denominator")
        ).alias("avg_st"),
        F.min("f").alias("min_st"),
        F.max("s").alias("max_st"),
        F.array_sort(F.collect_set("v")).alias("uniq_st"),
        F.struct(
            F.max_by("s", "v").alias("result"), F.max("v").alias("comparison")
        ).alias("argmax_st"),
    )
    merged = parts.groupBy("k").agg(
        merge_agg_state("count", F.col("cnt_st")).alias("cnt"),
        merge_agg_state("sum, Int64", F.col("sum_st")).alias("sm"),
        merge_agg_state("avg, Int64", F.col("avg_st")).alias("av"),
        merge_agg_state("min, Float64", F.col("min_st")).alias("mn"),
        merge_agg_state("max, String", F.col("max_st")).alias("mx"),
        merge_agg_state("uniqExact, Int64", F.col("uniq_st")).alias("uq"),
        merge_agg_state("argMax, String, Int64", F.col("argmax_st")).alias(
            "am"
        ),
    )
    got = {
        r["k"]: r
        for r in merged.select(
            "k",
            finalize_agg_state("count", F.col("cnt")).alias("n"),
            finalize_agg_state("sum, Int64", F.col("sm")).alias("total"),
            finalize_agg_state("avg, Int64", F.col("av")).alias("mean"),
            finalize_agg_state("min, Float64", F.col("mn")).alias("mn"),
            finalize_agg_state("max, String", F.col("mx")).alias("mx"),
            finalize_agg_state("uniqExact, Int64", F.col("uq")).alias("uq"),
            finalize_agg_state("argMax, String, Int64", F.col("am")).alias(
                "am"
            ),
        ).collect()
    }
    exp = {
        r["k"]: r
        for r in df.groupBy("k")
        .agg(
            F.count("*").alias("n"),
            F.sum("v").alias("total"),
            (F.sum("v") / F.count("*")).alias("mean"),
            F.min("f").alias("mn"),
            F.max("s").alias("mx"),
            F.countDistinct("v").alias("uq"),
            F.max_by("s", "v").alias("am"),
        )
        .collect()
    }
    assert set(got) == set(exp)
    for k in exp:
        for c in ("n", "total", "mean", "mn", "mx", "uq", "am"):
            assert got[k][c] == exp[k][c], (k, c, got[k][c], exp[k][c])


def test_native_file_roundtrip_with_mixed_state_columns(tmp_path, spark):
    """States written by the engine's writer read back through the
    clickhouse_native DataSource with the right Spark schema."""
    import os

    from duckdb_extension_clickhouse_native_spark.native.writer import (
        write_native_file,
    )

    specs = [
        ("k", "String"),
        ("c", "AggregateFunction(count)"),
        ("s", "AggregateFunction(sum, Int64)"),
        ("m", "AggregateFunction(min, String)"),
        ("u", "AggregateFunction(uniqExact, Int16)"),
    ]
    types = [parse_type(s) for _n, s in specs]
    tbl = pa.table(
        {
            "k": pa.array(["a", "b"]),
            "c": pa.array([2, 3], type=pa.int64()),
            "s": pa.array([10, -4], type=pa.int64()),
            "m": pa.array(["x", None], type=pa.string()),
            "u": pa.array([[1, 5], []], type=pa.list_(pa.int16())),
        }
    )
    path = os.path.join(tmp_path, "states.clickhouse")
    write_native_file(path, tbl, ch_types=types)
    df = spark.read.format("clickhouse_native").load(str(tmp_path))
    rows = {r["k"]: r for r in df.collect()}
    assert rows["a"]["c"] == 2 and rows["b"]["s"] == -4
    assert rows["a"]["m"] == "x" and rows["b"]["m"] is None
    assert rows["a"]["u"] == [1, 5] and rows["b"]["u"] == []


def test_truncated_state_raises_eof():
    t = parse_type("AggregateFunction(avg, Int64)")
    arr = pa.array(
        [{"numerator": 1, "denominator": 1}], type=to_arrow(t)
    )
    buf = io.BytesIO()
    encode_column(buf, t, arr)
    raw = buf.getvalue()[:-1]
    with pytest.raises(EOFError):
        decode_column(io.BytesIO(raw), t, 1)


def test_bad_has_flag_raises():
    t = parse_type("AggregateFunction(min, Int32)")
    with pytest.raises(ValueError, match="has-flag"):
        decode_column(io.BytesIO(b"\x07\x00\x00\x00\x00"), t, 1)
