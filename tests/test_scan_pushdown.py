"""Remote filter pushdown for clickhouse_scan (r10): Spark predicates
are rendered into the remote SQL (``SELECT * FROM (q) AS __pushed
WHERE ...``) so the SERVER filters before shipping rows.  The mock
server records every SELECT it receives, so these tests assert BOTH
the result values and that the WHERE actually reached the server."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def pushdown_mock():
    from duckdb_extension_clickhouse_native_spark.sources.mock_server import (
        build_handler,
        serve,
    )

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT range AS id, range * 2 AS v, "
        "'name_' || CAST(range % 10 AS VARCHAR) AS s, "
        "CASE WHEN range % 5 = 0 THEN NULL ELSE range END AS n "
        "FROM range(1000)"
    )
    log: list = []
    url = serve(build_handler(con, query_hook=log.append))
    yield url, log


def _scan(spark, url, **opts):
    r = spark.read.format("clickhouse_scan").option("url", url).option("table", "t")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_int_comparison_pushed(spark, pushdown_mock):
    url, log = pushdown_mock
    log.clear()
    rows = _scan(spark, url).filter(F.col("id") < 10).collect()
    assert sorted(r["id"] for r in rows) == list(range(10))
    pushed = [q for q in log if "__pushed" in q and '"id" < 10' in q]
    assert pushed, log


def test_string_eq_and_in_pushed(spark, pushdown_mock):
    url, log = pushdown_mock
    log.clear()
    rows = (
        _scan(spark, url)
        .filter((F.col("s") == "name_3") & (F.col("id").isin(3, 13, 23)))
        .collect()
    )
    assert sorted(r["id"] for r in rows) == [3, 13, 23]
    pushed = [
        q for q in log
        if "'name_3'" in q and '"id" IN (3, 13, 23)' in q
    ]
    assert pushed, log


def test_isnotnull_pushed_and_null_semantics(spark, pushdown_mock):
    url, log = pushdown_mock
    log.clear()
    n = _scan(spark, url).filter(F.col("n").isNotNull()).count()
    assert n == 800
    assert any('"n" IS NOT NULL' in q for q in log), log


def test_unsupported_filter_stays_spark_side(spark, pushdown_mock):
    url, log = pushdown_mock
    log.clear()
    # contains() is not rendered remotely — result must still be right
    rows = _scan(spark, url).filter(F.col("s").contains("e_7")).collect()
    assert len(rows) == 100
    assert not any("LIKE" in q for q in log), log


def test_pushdown_disabled_option(spark, pushdown_mock):
    url, log = pushdown_mock
    log.clear()
    rows = _scan(spark, url, pushdown="false").filter(F.col("id") < 5).collect()
    assert len(rows) == 5
    assert not any("__pushed" in q for q in log), log


def test_quote_in_string_literal(spark, pushdown_mock):
    url, log = pushdown_mock
    con_probe = [q for q in log]  # noqa: F841
    log.clear()
    # value with a single quote: must be doubled, not break the SQL
    rows = _scan(spark, url).filter(F.col("s") == "o'brien").collect()
    assert rows == []
    assert any("'o''brien'" in q for q in log), log


def test_pushdown_composes_with_split_reads(spark, pushdown_mock):
    url, log = pushdown_mock
    log.clear()
    df = _scan(
        spark,
        url,
        partition_column="id",
        num_partitions="4",
        lower_bound="0",
        upper_bound="1000",
    ).filter(F.col("v") >= 1900)
    rows = sorted(r["id"] for r in df.collect())
    assert rows == list(range(950, 1000))
    # every split subquery carries the pushed WHERE
    splits = [q for q in log if "__split" in q]
    assert splits and all('"v" >= 1900' in q for q in splits), log


def test_pushdown_over_tcp_transport(spark):
    """pushFilters is transport-independent: the wrapped query reaches
    the native-TCP mock too."""
    from duckdb_extension_clickhouse_native_spark.sources.mock_tcp_server import (
        build_tcp_handler,
        serve_tcp,
    )

    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT range AS id, range * 3 AS w FROM range(500)")
    log: list = []
    host, port = serve_tcp(build_tcp_handler(con, query_hook=log.append))
    df = (
        spark.read.format("clickhouse_scan")
        .option("url", f"tcp://{host}:{port}")
        .option("table", "t")
        .load()
        .filter(F.col("id") >= 495)
    )
    assert sorted(r["id"] for r in df.collect()) == [495, 496, 497, 498, 499]
    assert any("__pushed" in q and '"id" >= 495' in q for q in log), log
