"""Totals / Extremes / Log / TableColumns mid-stream packets (r9
verdict #4): the client's packet pump declared dispatch arms for all
four server packet types but no test ever drove them — a real server
emitting them would have hit untested code.

Two independent exercises:

1. a RECORDED transcript (raw struct/varint literals, reusing the
   inline wire primitives of test_tcp_recorded_transcript) with all
   four packet kinds interleaved between the header and data blocks —
   pins the byte-level skip/consume behavior;
2. the LIVE mock TCP server with ``interleave=True`` emitting the same
   packet kinds around every data block, read through both the raw
   client and the Spark DataSource — result rows identical to a
   non-interleaving server, including under wire compression (Log
   stays uncompressed while Totals/Extremes ride the negotiated
   codec).
"""

from __future__ import annotations

import struct

import duckdb
import pytest

from test_tcp_recorded_transcript import (
    BLOCK_INFO,
    DATA_BLOCK,
    END_OF_STREAM,
    HEADER_BLOCK,
    PROFILE_INFO,
    PROGRESS,
    _run_client_against,
    s,
    v,
)

# -- 1. recorded transcript ---------------------------------------------------

TOTALS_BLOCK = (
    v(7) + s("")  # SERVER_TOTALS + external table name
    + BLOCK_INFO
    + v(2) + v(1)
    + s("number") + s("UInt64") + struct.pack("<Q", 10)
    + s("word") + s("String") + s(b"sum")
)

EXTREMES_BLOCK = (
    v(8) + s("")  # SERVER_EXTREMES: min and max rows
    + BLOCK_INFO
    + v(2) + v(2)
    + s("number") + s("UInt64") + struct.pack("<QQ", 0, 4)
    + s("word") + s("String") + s(b"alpha") + s(b"epsilon")
)

LOG_BLOCK = (
    v(10) + s("")  # SERVER_LOG — never compressed
    + BLOCK_INFO
    + v(1) + v(1)
    + s("text") + s("String") + s(b"MemoryTracker: peak 1.00 MiB")
)

TABLE_COLUMNS = (
    v(11)
    + s("")  # external table name
    + s("columns format version: 1\n2 columns:\n`number` UInt64\n`word` String\n")
)

AUX_SELECT_RESPONSE = (
    HEADER_BLOCK
    + LOG_BLOCK          # before any data (real servers do this)
    + TABLE_COLUMNS
    + PROGRESS
    + DATA_BLOCK
    + TOTALS_BLOCK       # after data, before EOS (real-server order)
    + EXTREMES_BLOCK
    + LOG_BLOCK
    + PROFILE_INFO
    + PROGRESS
    + END_OF_STREAM
)


def test_recorded_transcript_with_aux_packets(monkeypatch):
    def go(client):
        return list(
            client.execute_blocks("SELECT number, word FROM interop_fixture")
        )

    blocks, errors = _run_client_against(AUX_SELECT_RESPONSE, monkeypatch, go)
    assert errors == []
    # the Log/Totals/Extremes/TableColumns payloads are consumed and
    # DISCARDED — only the one real data block surfaces
    assert len(blocks) == 1
    rb = blocks[0].to_record_batch()
    assert rb.column("number").to_pylist() == [0, 1, 2, 3, 4]
    assert rb.column("word").to_pylist() == [
        "alpha", "beta", "", "delta", "epsilon",
    ]


# -- 2. live interleaving mock server ------------------------------------------

@pytest.fixture(scope="module")
def _duck():
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT range AS id, 'w' || CAST(range AS VARCHAR)"
        " AS w FROM range(1000)"
    )
    return con


def _serve(con, **kw):
    from duckdb_extension_clickhouse_native_spark.sources.mock_tcp_server import (
        build_tcp_handler,
        serve_tcp,
    )

    host, port = serve_tcp(build_tcp_handler(con, **kw))
    return f"tcp://{host}:{port}"


@pytest.mark.parametrize("compression", [None, "lz4", "zstd"])
def test_live_interleaved_server_matches_plain(_duck, compression):
    from duckdb_extension_clickhouse_native_spark.sources.http_client import (
        resolve_connection,
    )
    from duckdb_extension_clickhouse_native_spark.sources.http_client import (
        make_client,
    )

    q = "SELECT id, w FROM t ORDER BY id"
    rows = {}
    for interleave in (False, True):
        url = _serve(_duck, interleave=interleave)
        if compression:
            url += f"/?compression={compression}"
        conn = resolve_connection({"url": url})
        client = make_client(conn)
        try:
            blocks = list(client.execute_blocks(q))
            out = []
            for b in blocks:
                rb = b.to_record_batch()
                out.extend(zip(rb.column("id").to_pylist(), rb.column("w").to_pylist()))
            rows[interleave] = out
        finally:
            client.close()
    assert rows[True] == rows[False]
    assert len(rows[True]) == 1000


def test_spark_datasource_reads_through_interleaved_server(spark, _duck):
    url = _serve(_duck, interleave=True)
    df = (
        spark.read.format("clickhouse_scan")
        .option("url", url)
        .option("query", "SELECT id, w FROM t WHERE id < 100")
        .load()
    )
    got = sorted((r["id"], r["w"]) for r in df.collect())
    assert got == [(i, f"w{i}") for i in range(100)]
