"""ParquetMetadata format + external-server table-function refusals
(r15 fourth tranche)."""

from __future__ import annotations

import json

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def test_parquetmetadata_one_row_per_file(spark, tmp_path):
    from duckdb_extension_clickhouse_native_spark.sources.file_table import (
        file_table,
    )

    p1 = tmp_path / "a.parquet"
    p2 = tmp_path / "b.parquet"
    pq.write_table(pa.table({"x": list(range(100))}), p1)
    pq.write_table(pa.table({"x": [1], "y": ["s"]}), p2)
    df = file_table(
        spark, f"{tmp_path}/*.parquet", "ParquetMetadata",
        virtual_columns=True,
    )
    rows = {r["_file"]: r for r in df.collect()}
    assert rows["a.parquet"]["num_rows"] == 100
    assert rows["a.parquet"]["num_columns"] == 1
    assert rows["b.parquet"]["num_columns"] == 2
    cols = [json.loads(c) for c in rows["b.parquet"]["columns"]]
    assert {c["name"] for c in cols} == {"x", "y"}
    assert all("compression" in c for c in cols)


def test_parquetmetadata_is_read_only_for_insert(spark):
    from duckdb_extension_clickhouse_native_spark.sources.url_table import (
        url_insert,
    )

    with pytest.raises(ValueError, match="read-only"):
        url_insert(spark.range(1), "http://127.0.0.1:1/x", "ParquetMetadata")


@pytest.mark.parametrize(
    "fn_name,frag",
    [
        ("mysql_table", "spark.read.jdbc"),
        ("postgresql_table", "spark.read.jdbc"),
        ("mongodb_table", "JSONEachRow"),
        ("redis_table", "broadcast join"),
        ("jdbc_table", "spark.read.jdbc"),
        ("odbc_table", "JDBC driver"),
        ("executable_table", "policy"),
        ("executable_pool_table", "policy"),
        ("hudi_table", "deltaLake"),
    ],
)
def test_external_server_named_refusals(fn_name, frag):
    from duckdb_extension_clickhouse_native_spark.sources import (
        external_refusals,
    )

    fn = getattr(external_refusals, fn_name)
    with pytest.raises(NotImplementedError, match=frag):
        fn("host", "db", "table")
