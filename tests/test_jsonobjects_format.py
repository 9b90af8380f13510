"""Plain FORMAT JSONEachRow (the eighth wire format): object-per-line
codec round-trips, the full-matrix differential against the Native
fetch, split reads, nested types, and the INSERT path."""

from __future__ import annotations

import io
import math

import pytest

from duckdb_extension_clickhouse_native_spark.native.jsoneachrow import (
    iter_jsonobjects_blocks,
    write_jsonobjects,
)
from duckdb_extension_clickhouse_native_spark.native.types import parse_type

# importing the fixture registers it in this module (pytest semantics);
# _norm is the shared sort-based normalizer
from test_wire_format_matrix import _norm, wide_mock  # noqa: F401


def _schema(pairs):
    return [(n, parse_type(t)) for n, t in pairs]


def test_codec_roundtrip_objects():
    import pyarrow as pa

    batch = pa.record_batch(
        {
            "i": pa.array([1, None, 3], pa.int64()),
            "s": pa.array(["a", 'qu"ote', None], pa.string()),
            "f": pa.array([1.5, float("nan"), float("inf")], pa.float64()),
            "arr": pa.array([[1, 2], [], None], pa.list_(pa.int64())),
        }
    )
    buf = io.BytesIO()
    n = write_jsonobjects(buf, [batch])
    assert n == 3
    lines = buf.getvalue().decode().strip().split("\n")
    assert len(lines) == 3 and lines[0].startswith("{")
    buf.seek(0)
    schema = _schema(
        [
            ("i", "Nullable(Int64)"),
            ("s", "Nullable(String)"),
            ("f", "Float64"),
            ("arr", "Array(Int64)"),
        ]
    )
    out = list(iter_jsonobjects_blocks(buf, schema))[0].to_record_batch()
    assert out.column("i").to_pylist() == [1, None, 3]
    assert out.column("s").to_pylist() == ["a", 'qu"ote', None]
    f = out.column("f").to_pylist()
    assert f[0] == 1.5 and math.isnan(f[1]) and f[2] == float("inf")
    assert out.column("arr").to_pylist() == [[1, 2], [], None]


def test_missing_and_unknown_keys():
    schema = _schema([("a", "Nullable(Int64)"), ("b", "Nullable(String)")])
    body = b'{"a":1,"zzz":9}\n{"b":"x"}\n'
    out = list(iter_jsonobjects_blocks(io.BytesIO(body), schema))[0]
    rb = out.to_record_batch()
    assert rb.column("a").to_pylist() == [1, None]
    assert rb.column("b").to_pylist() == [None, "x"]


def test_non_object_line_raises():
    schema = _schema([("a", "Int64")])
    with pytest.raises(ValueError, match="not a JSON object"):
        list(iter_jsonobjects_blocks(io.BytesIO(b"[1]\n"), schema))


def test_jsonobjects_requires_http():
    from pyspark.sql.types import LongType, StructField, StructType

    from duckdb_extension_clickhouse_native_spark.sources.scan_datasource import (
        ClickHouseScanReader,
    )

    with pytest.raises(ValueError, match="http"):
        ClickHouseScanReader(
            StructType([StructField("x", LongType())]),
            {"query": "SELECT 1", "url": "tcp://h:9000",
             "wire_format": "jsonobjects"},
        )


def test_full_matrix_matches_native(spark, wide_mock):
    """jsonobjects must reproduce the Native fetch on the full hostile
    matrix INCLUDING arrays and floats: our writer quotes denormals
    (the lossless server setting), so NaN/Inf and NULL stay distinct."""

    def load(fmt):
        return (
            spark.read.format("clickhouse_scan")
            .option("query", "SELECT * FROM wide")
            .option("url", wide_mock)
            .option("wire_format", fmt)
            .load()
        )

    native = _norm(load("native").collect())
    assert len(native) == 200
    assert _norm(load("jsonobjects").collect()) == native


def test_split_read_matches_native(spark, wide_mock):
    def load(fmt):
        return (
            spark.read.format("clickhouse_scan")
            .option("query", "SELECT i32, s, f64, arr FROM wide")
            .option("url", wide_mock)
            .option("wire_format", fmt)
            .option("partition_column", "i32")
            .option("num_partitions", "4")
            .option("lower_bound", "-5000000")
            .option("upper_bound", "15000000")
            .load()
        )

    assert _norm(load("jsonobjects").collect()) == _norm(
        load("native").collect()
    )


def test_nested_matches_native(spark, wide_mock):
    from pyspark.sql import functions as F

    q = (
        "SELECT i32, MAP(['a', 'b'], [i32, i32 * 2]) AS m, "
        "{'x': i32, 'y': s} AS t FROM wide"
    )

    def load(fmt):
        df = (
            spark.read.format("clickhouse_scan")
            .option("query", q)
            .option("url", wide_mock)
            .option("wire_format", fmt)
            .load()
        )
        return df.select(
            "i32",
            F.element_at(F.col("m"), "a").alias("m_a"),
            F.element_at(F.col("m"), "b").alias("m_b"),
            F.col("t._1").alias("t_x"),
            F.col("t._2").alias("t_y"),
        )

    assert _norm(load("jsonobjects").collect()) == _norm(
        load("native").collect()
    )


def test_insert_roundtrip(spark, mock_ch_server):
    import pandas as pd

    url = mock_ch_server["url"]
    state = mock_ch_server["state"]
    before = len(state["inserted"])
    df = spark.createDataFrame(
        pd.DataFrame({"x": [10, 20, 30], "name": ["a", "b", "c"]})
    ).coalesce(1)
    (
        df.write.format("clickhouse_scan")
        .option("table", "jsonobj_sink")
        .option("url", url)
        .option("wire_format", "jsonobjects")
        .mode("append")
        .save()
    )
    new = state["inserted"][before:]
    assert new and new[0][0] == "jsonobj_sink"
    rows = []
    for _table, batches in new:
        for rb in batches:
            rows.extend(
                zip(rb.column("x").to_pylist(), rb.column("name").to_pylist())
            )
    assert sorted(rows) == [(10, "a"), (20, "b"), (30, "c")]
