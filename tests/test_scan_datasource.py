"""Tests for the clickhouse_scan DataSource against the DuckDB-backed
mock ClickHouse HTTP server (conftest.mock_ch_server)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from duckdb_extension_clickhouse_native_spark.sources.http_client import (
    resolve_connection,
    schema_probe_query,
)


def test_resolve_connection_tcp_transport(monkeypatch):
    # tcp:// URLs are honored as native-protocol connections (the
    # reference's transport, clickhouse_scan.rs:73-78), not remapped
    monkeypatch.delenv("CLICKHOUSE_URL", raising=False)
    c = resolve_connection({"url": "tcp://myhost:9000"})
    assert c.transport == "tcp" and (c.host, c.port) == ("myhost", 9000)
    c = resolve_connection({"url": "tcp://u:p@remote:9440/?secure=true"})
    assert c.transport == "tcp" and c.port == 9440 and c.secure
    assert c.user == "u" and c.password == "p"


def test_resolve_connection_env_fallback(monkeypatch):
    # reference behavior: named param > env var > default
    # (clickhouse_scan.rs:55-71, README.md:19-23)
    monkeypatch.setenv("CLICKHOUSE_URL", "http://envhost:8123")
    monkeypatch.setenv("CLICKHOUSE_USER", "envuser")
    c = resolve_connection({})
    assert c.base_url == "http://envhost:8123"
    assert c.user == "envuser"
    c = resolve_connection({"url": "http://opthost:8123", "user": "optuser"})
    assert c.base_url == "http://opthost:8123" and c.user == "optuser"


def test_schema_probe_query_wraps():
    q = schema_probe_query("SELECT 1 AS x; ")
    assert "WHERE 0 = 1" in q and "SELECT 1 AS x" in q


def test_scan_basic(spark, mock_ch_server):
    df = (
        spark.read.format("clickhouse_scan")
        .option("query", "SELECT number, number * 2 AS dbl FROM numbers WHERE number < 10")
        .option("url", mock_ch_server["url"])
        .load()
    )
    assert df.schema.simpleString() == "struct<number:bigint,dbl:bigint>"
    rows = {r["number"]: r["dbl"] for r in df.collect()}
    assert rows == {i: 2 * i for i in range(10)}


def test_scan_typed_columns(spark, mock_ch_server):
    df = (
        spark.read.format("clickhouse_scan")
        .option("query", "SELECT i, f, s, b FROM typed")
        .option("url", mock_ch_server["url"])
        .load()
    )
    row = df.orderBy("i").collect()[3]
    assert row["i"] == 3 and row["s"] == "row3" and row["b"] is False
    assert abs(row["f"] - 3 / 7) < 1e-12


def test_scan_split_partitions(spark, mock_ch_server):
    df = (
        spark.read.format("clickhouse_scan")
        .option("query", "SELECT number FROM numbers")
        .option("partition_column", "number")
        .option("num_partitions", "4")
        .option("lower_bound", "0")
        .option("upper_bound", "10000")
        .option("url", mock_ch_server["url"])
        .load()
    )
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 10000
    assert df.agg(F.sum("number")).collect()[0][0] == 9999 * 10000 // 2


def test_scan_insert_writer(spark, mock_ch_server):
    src = spark.range(100).select(
        F.col("id").alias("n"), (F.col("id") * 2).cast("double").alias("v")
    )
    (
        src.write.format("clickhouse_scan")
        .option("table", "target_table")
        .option("url", mock_ch_server["url"])
        .mode("append")
        .save()
    )
    inserted = mock_ch_server["state"]["inserted"]
    assert inserted
    total = sum(
        b.num_rows for table, batches in inserted for b in batches if table == "target_table"
    )
    assert total == 100
