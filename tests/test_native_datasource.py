"""End-to-end tests for the clickhouse_native Spark DataSource."""

from __future__ import annotations

import os

import duckdb
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from conftest import SF_SMALL
from duckdb_extension_clickhouse_native_spark.native import write_native_file


@pytest.fixture(scope="module")
def lineitem_native(tmp_path_factory):
    d = tmp_path_factory.mktemp("native")
    t = pq.read_table(f"{SF_SMALL}/lineitem.parquet")
    p = str(d / "lineitem.clickhouse")
    write_native_file(p, t, block_rows=1500)
    return p, t.num_rows


def test_count_and_agg_match_oracle(spark, lineitem_native):
    path, n = lineitem_native
    df = spark.read.format("clickhouse_native").load(path)
    assert df.count() == n
    got = df.filter(F.col("l_quantity") > 25).agg(
        F.count("*").alias("n"), F.max("l_orderkey").alias("mx")
    ).collect()[0]
    want = duckdb.sql(
        f"SELECT count(*), max(l_orderkey) FROM '{SF_SMALL}/lineitem.parquet' "
        "WHERE l_quantity > 25"
    ).fetchone()
    assert (got["n"], got["mx"]) == want


def test_filter_pushdown_matches_post_filter(spark, lineitem_native):
    path, _ = lineitem_native
    df = spark.read.format("clickhouse_native").load(path)
    pushed = df.filter(
        (F.col("l_returnflag") == "R") & (F.col("l_quantity") >= 30)
    ).count()
    want = duckdb.sql(
        f"SELECT count(*) FROM '{SF_SMALL}/lineitem.parquet' "
        "WHERE l_returnflag = 'R' AND l_quantity >= 30"
    ).fetchone()[0]
    assert pushed == want


def test_projection_option(spark, lineitem_native):
    path, n = lineitem_native
    df = (
        spark.read.format("clickhouse_native")
        .option("columns", "l_orderkey,l_quantity")
        .load(path)
    )
    assert df.columns == ["l_orderkey", "l_quantity"]
    assert df.count() == n


def test_split_blocks_partitioning(spark, lineitem_native):
    path, n = lineitem_native
    df = (
        spark.read.format("clickhouse_native")
        .option("split_blocks", "true")
        .option("target_partition_bytes", str(64 * 1024))
        .load(path)
    )
    assert df.rdd.getNumPartitions() > 1
    assert df.count() == n


def test_write_and_read_back(spark, tmp_path):
    src = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    out = str(tmp_path / "orders_native")
    src.write.format("clickhouse_native").mode("overwrite").save(out)
    assert os.path.exists(os.path.join(out, "_SUCCESS"))
    back = spark.read.format("clickhouse_native").load(out)
    assert back.count() == src.count()
    a = {r["o_orderkey"]: r["o_totalprice"] for r in src.collect()}
    b = {r["o_orderkey"]: r["o_totalprice"] for r in back.collect()}
    assert a == b


def test_directory_and_glob_reads(spark, tmp_path):
    t = pq.read_table(f"{SF_SMALL}/region.parquet")
    for i in range(3):
        write_native_file(str(tmp_path / f"r{i}.clickhouse"), t)
    df_dir = spark.read.format("clickhouse_native").load(str(tmp_path))
    df_glob = spark.read.format("clickhouse_native").load(str(tmp_path / "r*.clickhouse"))
    assert df_dir.count() == 3 * t.num_rows
    assert df_glob.count() == 3 * t.num_rows
    assert df_dir.rdd.getNumPartitions() == 3


def test_missing_file_is_planning_error(spark):
    with pytest.raises(Exception):
        spark.read.format("clickhouse_native").load("/nonexistent/x.clickhouse").count()


def test_allow_missing_columns_additive_evolution(spark, tmp_path):
    """A directory mixing old files (k only) and new files (k, v) reads
    with the newest schema when allow_missing_columns=true — old files
    surface v as NULLs; the default still raises on drift."""
    import pyarrow as pa

    from duckdb_extension_clickhouse_native_spark.native import write_native_file

    d = str(tmp_path / "evolve")
    os.makedirs(d)
    write_native_file(
        os.path.join(d, "a-old.clickhouse"),
        pa.table({"k": pa.array([1, 2], pa.int64())}),
    )
    write_native_file(
        os.path.join(d, "b-new.clickhouse"),
        pa.table(
            {"k": pa.array([3, 4], pa.int64()), "v": pa.array([30.0, 40.0])}
        ),
    )
    schema = "k bigint, v double"
    df = (
        spark.read.format("clickhouse_native")
        .schema(schema)
        .option("allow_missing_columns", "true")
        .load(d)
    )
    got = sorted((r.k, r.v) for r in df.collect())
    assert got == [(1, None), (2, None), (3, 30.0), (4, 40.0)]

    strict = spark.read.format("clickhouse_native").schema(schema).load(d)
    with pytest.raises(Exception, match="missing from block"):
        strict.collect()


def test_append_mode_accumulates(spark, tmp_path):
    """Sequential append writes coexist (uuid part names can't
    collide) and a read sees the union; overwrite then replaces all."""
    d = str(tmp_path / "appendacc")
    a = spark.range(0, 50).selectExpr("id AS k")
    b = spark.range(50, 80).selectExpr("id AS k")
    a.write.format("clickhouse_native").mode("append").save(d)
    b.write.format("clickhouse_native").mode("append").save(d)
    got = spark.read.format("clickhouse_native").schema("k bigint").load(d)
    assert sorted(r.k for r in got.collect()) == list(range(80))
    a.write.format("clickhouse_native").mode("overwrite").save(d)
    got = spark.read.format("clickhouse_native").schema("k bigint").load(d)
    assert sorted(r.k for r in got.collect()) == list(range(50))
