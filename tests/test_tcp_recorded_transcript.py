"""Recorded-wire interop: replay a hand-authored, byte-exact server
transcript through ``ClickHouseTCPClient`` (VERDICT r7 item 5).

The mock server in other tests shares ``tcp_protocol``'s writers with
the client, so a symmetric encode/decode bug could hide there ("the
mock only proves the mock"). Here the SERVER bytes are assembled from
raw struct/varint literals in THIS file, straight from the published
native-protocol layout (the wire emitted by a ClickHouse 24.x server
at its revision 54468 talking to a rev-54429 client — every field
gated exactly as TCPHandler::sendHello / sendProgress /
sendProfileInfo gate them on the CLIENT revision), and the CLIENT
bytes are parsed back with an equally independent inline reader. The
package's own writers/readers never touch the transcript.

Reference behavior being pinned: clickhouse_scan.rs:73-131 drives the
same protocol via clickhouse-rs.
"""

from __future__ import annotations

import socket
import struct
import threading

import pytest

from duckdb_extension_clickhouse_native_spark.sources.tcp_client import (
    ClickHouseTCPClient,
)
from duckdb_extension_clickhouse_native_spark.sources.tcp_protocol import (
    ClickHouseServerException,
)

# -- independent wire primitives (spec-derived, NOT tcp_protocol's) ---------


def v(n: int) -> bytes:
    """ULEB128 varint."""
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        out.append(b | (0x80 if n else 0))
        if not n:
            return bytes(out)


def s(t: str | bytes) -> bytes:
    b = t.encode() if isinstance(t, str) else t
    return v(len(b)) + b


def rv(f) -> int:
    shift, out = 0, 0
    while True:
        b = f.read(1)
        if not b:
            raise EOFError("transcript reader hit EOF")
        out |= (b[0] & 0x7F) << shift
        if not b[0] & 0x80:
            return out
        shift += 7


def rs(f) -> bytes:
    return f.read(rv(f))


# -- the recorded transcript ------------------------------------------------

SERVER_REVISION = 54468  # a 24.x server; client is pinned at 54429

# Hello: fields past the revision are gated on the CLIENT's revision
# (54429 >= timezone 54058 / display_name 54372 / version_patch 54401)
SERVER_HELLO_BYTES = (
    v(0)                      # SERVER_HELLO
    + s("ClickHouse")         # server name
    + v(24) + v(8)            # version major/minor
    + v(SERVER_REVISION)
    + s("Europe/Amsterdam")   # timezone
    + s("production")         # display name
    + v(2)                    # version patch
)

BLOCK_INFO = v(1) + bytes([0]) + v(2) + struct.pack("<i", -1) + v(0)

# header block: 2 columns, 0 rows (the schema announcement a real
# server sends before any data)
HEADER_BLOCK = (
    v(1) + s("")              # SERVER_DATA + external table name
    + BLOCK_INFO
    + v(2) + v(0)             # n_columns, n_rows
    + s("number") + s("UInt64")
    + s("word") + s("String")
)

ROWS = [(0, b"alpha"), (1, b"beta"), (2, b""), (3, b"delta"), (4, b"epsilon")]

DATA_BLOCK = (
    v(1) + s("")
    + BLOCK_INFO
    + v(2) + v(len(ROWS))
    + s("number") + s("UInt64")
    + b"".join(struct.pack("<Q", n) for n, _ in ROWS)
    + s("word") + s("String")
    + b"".join(s(w) for _, w in ROWS)
)

# Progress at client rev 54429: rows, bytes, total_rows (>=51554),
# written_rows + written_bytes (>=54372)
PROGRESS = v(3) + v(5) + v(77) + v(5) + v(0) + v(0)

# ProfileInfo: rows, blocks, bytes, applied_limit u8,
# rows_before_limit, calculated u8
PROFILE_INFO = v(6) + v(5) + v(1) + v(77) + bytes([0]) + v(5) + bytes([0])

END_OF_STREAM = v(5)

SELECT_RESPONSE = (
    HEADER_BLOCK + PROGRESS + DATA_BLOCK + PROFILE_INFO + PROGRESS + END_OF_STREAM
)

EXCEPTION_RESPONSE = (
    v(2)                                  # SERVER_EXCEPTION
    + struct.pack("<i", 60)               # UNKNOWN_TABLE
    + s("DB::Exception")
    + s("Table default.missing does not exist")
    + s("")                               # stack trace
    + bytes([0])                          # no nested exception
)


def _drain_client_preamble(rf, errors: list) -> None:
    """Parse (with the inline reader) and validate the client's hello,
    query packet and terminating empty data block, exactly as a
    rev-54468 server would for a rev-54429 client."""
    try:
        # Hello
        assert rv(rf) == 0
        assert rs(rf).startswith(b"ClickHouse ")
        rv(rf), rv(rf)  # client version major/minor
        assert rv(rf) == 54429  # pinned client revision
        assert rs(rf) == b"default"  # database
        assert rs(rf) == b"interop"  # user
        assert rs(rf) == b"sekrit"   # password
    except Exception as e:  # pragma: no cover - surfaced via errors
        errors.append(f"hello: {e!r}")


def _drain_query(rf, errors: list, compressed: bool = False) -> None:
    try:
        assert rv(rf) == 1  # CLIENT_QUERY
        qid = rs(rf)
        assert len(qid) == 32  # uuid4().hex
        # client info, gated on negotiated rev 54429
        assert rf.read(1)[0] == 1        # query kind INITIAL
        assert rs(rf) == b"interop"      # initial user
        assert rs(rf) == qid             # initial query id
        rs(rf)                           # initial address
        # NOT >=54449: no initial_query_start_time
        assert rf.read(1)[0] == 1        # interface TCP
        rs(rf), rs(rf), rs(rf)           # os_user, hostname, client name
        rv(rf), rv(rf)
        assert rv(rf) == 54429           # client revision again
        assert rs(rf) == b""             # quota key (>=54060)
        # NOT >=54448: no distributed depth
        rv(rf)                           # version patch (>=54401)
        # NOT >=54442: no opentelemetry byte
        assert rs(rf) == b""             # empty settings terminator
        # NOT >=54441: no interserver secret
        assert rv(rf) == 2               # stage COMPLETE
        assert rv(rf) == (1 if compressed else 0)  # compression flag
        assert rs(rf) == b"SELECT number, word FROM interop_fixture"
        # terminating empty client data block
        assert rv(rf) == 2               # CLIENT_DATA
        assert rs(rf) == b""             # table name
        if compressed:
            # one compressed frame: 16B checksum + 9B header + body
            rf.read(16)
            hdr = rf.read(9)
            assert hdr[0] in (0x82, 0x90)  # LZ4 or ZSTD method byte
            comp_size = struct.unpack("<I", hdr[1:5])[0]
            assert len(rf.read(comp_size - 9)) == comp_size - 9
        else:
            assert rv(rf) == 1 and rf.read(1)[0] == 0
            assert rv(rf) == 2
            assert struct.unpack("<i", rf.read(4))[0] == -1
            assert rv(rf) == 0               # end of BlockInfo
            assert rv(rf) == 0 and rv(rf) == 0  # 0 cols, 0 rows
    except Exception as e:  # pragma: no cover
        errors.append(f"query: {e!r}")


def _run_client_against(
    transcript: bytes, monkeypatch, query_fn, compressed_client: bool = False
):
    """Wire a socketpair between the client and a thread that speaks
    ONLY the recorded bytes; returns (result, server-side errors)."""
    cli_sock, srv_sock = socket.socketpair()
    errors: list = []

    def server():
        rf = srv_sock.makefile("rb")
        wf = srv_sock.makefile("wb")
        try:
            _drain_client_preamble(rf, errors)
            wf.write(SERVER_HELLO_BYTES)
            wf.flush()
            _drain_query(rf, errors, compressed=compressed_client)
            wf.write(transcript)
            wf.flush()
        finally:
            try:
                rf.close(), wf.close(), srv_sock.close()
            except Exception:
                pass

    t = threading.Thread(target=server, daemon=True)
    t.start()
    monkeypatch.setattr(
        socket, "create_connection", lambda *a, **k: cli_sock
    )
    client = ClickHouseTCPClient(
        "recorded.invalid", 9000, user="interop", password="sekrit"
    )
    try:
        out = query_fn(client)
    finally:
        client.close()
        t.join(timeout=10)
    return out, errors


def test_recorded_select_transcript(monkeypatch):
    """Full SELECT flow against the recorded rev-54468 server bytes:
    handshake fields land where the spec says, the negotiated revision
    is min(54468, 54429), interleaved Progress/ProfileInfo packets are
    consumed, and the hand-authored Native block decodes to the exact
    rows."""

    def go(client):
        blocks = list(
            client.execute_blocks("SELECT number, word FROM interop_fixture")
        )
        hello = client.server_hello
        return blocks, hello, client.revision

    (blocks, hello, revision), errors = _run_client_against(
        SELECT_RESPONSE, monkeypatch, go
    )
    assert errors == []
    assert hello.name == "ClickHouse"
    assert (hello.version_major, hello.version_minor) == (24, 8)
    assert hello.revision == SERVER_REVISION
    assert hello.timezone == "Europe/Amsterdam"
    assert hello.display_name == "production"
    assert revision == 54429
    assert len(blocks) == 1  # 0-row header block is filtered out
    rb = blocks[0].to_record_batch()
    assert rb.column("number").to_pylist() == [0, 1, 2, 3, 4]
    assert rb.column("word").to_pylist() == [
        "alpha", "beta", "", "delta", "epsilon",
    ]


def test_recorded_exception_transcript(monkeypatch):
    """A server Exception packet (raw bytes) surfaces as
    ClickHouseServerException with the wire code and message."""

    def go(client):
        with pytest.raises(ClickHouseServerException) as ei:
            list(client.execute_blocks("SELECT number, word FROM interop_fixture"))
        return ei.value

    exc, errors = _run_client_against(EXCEPTION_RESPONSE, monkeypatch, go)
    assert errors == []
    assert exc.code == 60
    assert "default.missing" in exc.message
