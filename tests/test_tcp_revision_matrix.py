"""Cross-revision TCP negotiation matrix (r12 verdict item 6).

The reference connects through clickhouse-rs (clickhouse_scan.rs:73-78)
and inherits its negotiation; our clean-room client advertises rev
54429 and must interoperate with servers BELOW it (every
revision-gated field downgrades to min(server, client)) and ABOVE it
(the server speaks newer, the negotiated min caps the wire at the
client's slice).  Plus the mid-stream failure shape: a server
Exception packet AFTER partial data blocks must surface as
ClickHouseServerException, never as partial results.
"""

from __future__ import annotations

import duckdb
import pytest

from duckdb_extension_clickhouse_native_spark.sources import tcp_protocol as proto
from duckdb_extension_clickhouse_native_spark.sources.mock_tcp_server import (
    build_tcp_handler,
    serve_tcp,
)
from duckdb_extension_clickhouse_native_spark.sources.tcp_client import (
    ClickHouseTCPClient,
)


@pytest.fixture(scope="module")
def _duck():
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT range AS id, 'w' || CAST(range AS VARCHAR)"
        " AS w FROM range(1000)"
    )
    con.execute("CREATE TABLE sink (id BIGINT, w VARCHAR)")
    return con


def _client_for(con, **kw) -> ClickHouseTCPClient:
    host, port = serve_tcp(build_tcp_handler(con, **kw))
    return ClickHouseTCPClient(host, port)


# the matrix spans every gate the client branches on between the two
# ends: 54058 (+timezone), 54372 (+display name / write info),
# 54401 (+version patch), 54429 (= client), 54454 and 60000 (> client:
# negotiated min must cap at 54429)
REVISIONS = [54058, 54372, 54401, 54429, 54454, 60000]


@pytest.mark.parametrize("rev", REVISIONS)
def test_select_across_revisions(_duck, rev):
    client = _client_for(_duck, server_revision=rev)
    try:
        blocks = list(client.execute_blocks("SELECT id, w FROM t ORDER BY id"))
        assert client.server_hello.revision == rev
        assert client.revision == min(rev, proto.CLIENT_REVISION)
        rb = blocks[0].to_record_batch()
        assert rb.column("id").to_pylist()[:3] == [0, 1, 2]
        assert rb.num_rows == 1000
    finally:
        client.close()


@pytest.mark.parametrize("rev", [54058, 60000])
def test_insert_across_revisions(_duck, rev):
    import pyarrow as pa

    from duckdb_extension_clickhouse_native_spark.native.types import parse_type

    client = _client_for(_duck, server_revision=rev, execute_inserts=True)
    rb = pa.RecordBatch.from_arrays(
        [pa.array([101, 102], type=pa.int64()), pa.array(["a", "b"])],
        names=["id", "w"],
    )
    try:
        client.insert_batches(
            "sink", [rb], [parse_type("Int64"), parse_type("String")]
        )
    finally:
        client.close()
    got = _duck.execute(
        "SELECT id, w FROM sink WHERE id IN (101, 102) ORDER BY id"
    ).fetchall()
    assert got == [(101, "a"), (102, "b")]
    _duck.execute("DELETE FROM sink WHERE id IN (101, 102)")


@pytest.mark.parametrize("compression", [None, "lz4"])
def test_midstream_exception_after_partial_data(_duck, compression):
    """fail_after_blocks=0 errors before any data; =1 errors after one
    real block has been consumed — both must raise, and the error must
    carry the server's code/name."""
    for nblocks in (0, 1):
        kw = {"server_revision": None, "fail_after_blocks": nblocks}
        if compression:
            kw["codec"] = compression
        client = _client_for(_duck, **kw)
        if compression:
            client.compression = proto.COMPRESSION_ENABLED
        try:
            with pytest.raises(proto.ClickHouseServerException) as ei:
                list(client.execute_blocks("SELECT id, w FROM t ORDER BY id"))
            assert ei.value.code == 241
            assert "MEMORY_LIMIT_EXCEEDED" in str(ei.value)
        finally:
            client.close()


def test_healthy_query_after_midstream_failure(_duck):
    """A failed stream must not poison subsequent work: a fresh client
    against a healthy server returns complete results."""
    bad = _client_for(_duck, fail_after_blocks=1)
    try:
        with pytest.raises(proto.ClickHouseServerException):
            list(bad.execute_blocks("SELECT id FROM t"))
    finally:
        bad.close()
    good = _client_for(_duck)
    try:
        blocks = list(good.execute_blocks("SELECT COUNT(*) AS n FROM t"))
        assert blocks[0].to_record_batch().column("n").to_pylist() == [1000]
    finally:
        good.close()
