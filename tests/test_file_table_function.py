"""file() table function (r14): local files through the shared wire
decoders, ClickHouse path spelling ({N..M}/{a,b} braces + */?
wildcards), one partition per matched file — the filesystem twin of
url() (docs: sql-reference/table-functions/file)."""

from __future__ import annotations

import io
import os

import pyarrow as pa
import pytest

from duckdb_extension_clickhouse_native_spark.sources.file_table import (
    expand_file_paths,
    file_table,
)


def _write_native(path, ks, vs):
    from duckdb_extension_clickhouse_native_spark.native.codec import write_block
    from duckdb_extension_clickhouse_native_spark.native.types import parse_type

    rb = pa.RecordBatch.from_arrays(
        [pa.array(ks, type=pa.int64()), pa.array(vs)], names=["k", "v"]
    )
    buf = io.BytesIO()
    write_block(buf, rb, [parse_type("Int64"), parse_type("String")])
    with open(path, "wb") as f:
        f.write(buf.getvalue())


def test_expand_file_paths(tmp_path):
    for i in (1, 2, 3):
        (tmp_path / f"p{i}.csv").write_text("x")
    base = str(tmp_path)
    assert expand_file_paths(f"{base}/p{{1..2}}.csv") == [
        f"{base}/p1.csv", f"{base}/p2.csv",
    ]
    assert expand_file_paths(f"{base}/p*.csv") == [
        f"{base}/p1.csv", f"{base}/p2.csv", f"{base}/p3.csv",
    ]
    assert expand_file_paths(f"{base}/p1.csv,{base}/p3.csv") == [
        f"{base}/p1.csv", f"{base}/p3.csv",
    ]
    with pytest.raises(FileNotFoundError, match="no such file"):
        expand_file_paths(f"{base}/missing.csv")
    assert expand_file_paths(f"{base}/nothing*.csv") == []


def test_file_table_native_glob(spark, tmp_path):
    _write_native(tmp_path / "a1.native", [1, 2], ["x", "y"])
    _write_native(tmp_path / "a2.native", [3], ["z"])
    df = file_table(spark, f"{tmp_path}/a{{1..2}}.native", "Native")
    assert df.rdd.getNumPartitions() == 2
    assert sorted(map(tuple, df.collect())) == [(1, "x"), (2, "y"), (3, "z")]


def test_file_table_headerless_structure(spark, tmp_path):
    (tmp_path / "h.csv").write_bytes(b'1,"a"\n2,"b"\n')
    df = file_table(
        spark, f"{tmp_path}/h.csv", "CSV", structure="k Int64, v String"
    )
    assert sorted(map(tuple, df.collect())) == [(1, "a"), (2, "b")]
    with pytest.raises(Exception, match="not self-describing"):
        file_table(spark, f"{tmp_path}/h.csv", "CSV").collect()


def test_file_sql_udtf(spark, tmp_path):
    _write_native(tmp_path / "u.native", [5, 6], ["p", "q"])
    rows = spark.sql(
        f"SELECT k, v FROM clickhouse_file('{tmp_path}/u.native', 'Native') "
        "ORDER BY k"
    ).collect()
    assert [tuple(r) for r in rows] == [(5, "p"), (6, "q")]


def test_file_swapped_column_order_realigns(spark, tmp_path):
    from duckdb_extension_clickhouse_native_spark.native.codec import write_block
    from duckdb_extension_clickhouse_native_spark.native.types import parse_type

    _write_native(tmp_path / "o1.native", [1], ["x"])
    rb = pa.RecordBatch.from_arrays(
        [pa.array(["y"]), pa.array([2], type=pa.int64())], names=["v", "k"]
    )
    buf = io.BytesIO()
    write_block(buf, rb, [parse_type("String"), parse_type("Int64")])
    (tmp_path / "o2.native").write_bytes(buf.getvalue())
    df = file_table(spark, f"{tmp_path}/o{{1..2}}.native", "Native")
    assert sorted(map(tuple, df.collect())) == [(1, "x"), (2, "y")]


def test_file_scan_entry_matches_oracle(spark):
    import duckdb

    import __spark_entry__ as e

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM '{sf}/lineitem.parquet'"
    )
    name = "tf_file_scan"
    srows = sorted(map(tuple, e.queries()[name](spark, sf).collect()))
    orows = sorted(map(tuple, con.execute(e.oracle_sql()[name]).fetchall()))
    assert srows == orows and len(srows) >= 1
