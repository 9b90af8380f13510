"""Cross-format differential: one wide-typed table served by the
DuckDB-backed mock, read through the REAL Spark DataSource over all
three HTTP wire formats — results must be identical row-for-row.

Native is the pinned baseline (its codec is validated against the
reference fixture and DuckDB oracles elsewhere); RowBinary and
JSONEachRow must reproduce it across the full writable type matrix,
including unicode/quote/newline strings, empty arrays, NULLs, Inf/NaN
doubles, decimals, dates and microsecond timestamps.
"""

from __future__ import annotations

import math
import threading

import duckdb
import pytest

WIDE_SQL = """
    CREATE VIEW wide AS
    SELECT
      CAST((r * 37) % 255 - 127 AS TINYINT)            AS t8,
      CAST((r * 1009) % 65535 - 32767 AS SMALLINT)     AS s16,
      CAST(r * 100003 - 5000000 AS INTEGER)            AS i32,
      CAST(r AS BIGINT) * 4611686018427387 - 1000      AS i64,
      CAST(r % 256 AS UTINYINT)                        AS u8,
      CAST((r * 997) % 65536 AS USMALLINT)             AS u16,
      CAST(r * 21474836 AS UINTEGER)                   AS u32,
      CAST(r AS UBIGINT) * 46116860184273800           AS u64,
      CAST(r AS FLOAT) / 7                             AS f32,
      CASE WHEN r % 50 = 10 THEN 'inf'::DOUBLE
           WHEN r % 50 = 20 THEN '-inf'::DOUBLE
           WHEN r % 50 = 30 THEN 'nan'::DOUBLE
           ELSE r / 7.0 END                            AS f64,
      CASE WHEN r % 11 = 0 THEN NULL
           WHEN r % 5 = 0 THEN ''
           WHEN r % 5 = 1 THEN 'héllo→世界'
           WHEN r % 5 = 2 THEN 'quote"back\\slash'
           WHEN r % 5 = 3 THEN 'line' || chr(10) || 'break'
           ELSE 'row' || r END                         AS s,
      r % 3 = 0                                        AS b,
      DATE '1969-01-01' + CAST(r * 13 AS INTEGER)      AS d,
      TIMESTAMP '2000-01-01' + to_microseconds(r * 1000003) AS ts,
      CAST((r * 10007 - 99999) / 10000.0 AS DECIMAL(18,4)) AS dec,
      CASE WHEN r % 7 = 0 THEN [] ELSE [r, r * 2, -r] END  AS arr
    FROM range(200) t(r)
"""


@pytest.fixture(scope="module")
def wide_mock():
    from duckdb_extension_clickhouse_native_spark.sources.mock_server import (
        build_handler,
        serve,
    )

    con = duckdb.connect()
    con.execute(WIDE_SQL)
    url = serve(build_handler(con, execute_inserts=False))
    yield url


def _norm(rows):
    def nv(x):
        if isinstance(x, float) and math.isnan(x):
            return "NaN"
        if isinstance(x, list):
            return tuple(x)
        return x

    return sorted(tuple(nv(v) for v in row) for row in rows)


def test_three_formats_agree_on_wide_matrix(spark, wide_mock):
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
    # spot-check the baseline actually carries the hostile values
    flat = [v for row in native for v in row]
    assert "NaN" in flat and float("inf") in flat and "héllo→世界" in flat
    assert "line\nbreak" in flat and None in flat
    assert _norm(load("rowbinary").collect()) == native
    assert _norm(load("jsoneachrow").collect()) == native


def test_formats_agree_under_split_read(spark, wide_mock):
    """Range-partitioned fetches must agree too (each partition opens
    its own stream — header handling per partition)."""

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

    native = _norm(load("native").collect())
    assert len(native) == 200
    assert _norm(load("rowbinary").collect()) == native
    assert _norm(load("jsoneachrow").collect()) == native


def test_five_formats_agree_without_arrays(spark, wide_mock):
    """TSV/CSV reject Array (nested-escaping swamp -> FORMAT Native
    pointer), so the five-way differential runs on the scalar matrix —
    still covering unicode/quote/newline strings, NULLs, Inf/NaN,
    decimals, dates and microsecond timestamps."""
    cols = "t8, s16, i32, i64, u8, u16, u32, f32, f64, s, b, d, ts, dec"

    def load(fmt):
        return (
            spark.read.format("clickhouse_scan")
            .option("query", f"SELECT {cols} FROM wide")
            .option("url", wide_mock)
            .option("wire_format", fmt)
            .load()
        )

    native = _norm(load("native").collect())
    assert len(native) == 200
    flat = [v for row in native for v in row]
    assert "NaN" in flat and float("inf") in flat and "héllo→世界" in flat
    assert "line\nbreak" in flat and None in flat
    for fmt in ("rowbinary", "jsoneachrow", "tsv", "csv", "values", "tskv"):
        assert _norm(load(fmt).collect()) == native, fmt


def test_nested_formats_agree(spark, wide_mock):
    """Map/Tuple joined the RowBinary and JSON matrices in round 9:
    the three structured formats must agree on nested columns
    (unpacked to scalars in Spark — map/struct cells are unhashable
    for the sort-based normalizer)."""
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

    native = _norm(load("native").collect())
    assert len(native) == 200
    assert _norm(load("rowbinary").collect()) == native
    assert _norm(load("jsoneachrow").collect()) == native


def test_arrow_formats_agree_on_full_matrix(spark, wide_mock):
    """ArrowStream + Parquet (sixth/seventh wire formats, r10) carry
    the FULL wide matrix including arrays — unlike TSV/CSV they are
    typed containers, so the differential matches the three-format
    test exactly."""

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
    assert _norm(load("arrowstream").collect()) == native
    assert _norm(load("parquet").collect()) == native


def test_arrow_formats_split_read(spark, wide_mock):
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

    native = _norm(load("native").collect())
    assert _norm(load("arrowstream").collect()) == native
    assert _norm(load("parquet").collect()) == native
