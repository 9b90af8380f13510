"""remote() / remoteSecure() table function + cluster address globs
(r14).  ClickHouse spelling: remote('host{1..4}:9000', db.table) —
address globs expand into the shard list (docs: table-functions/remote
'Addresses'), schemeless addresses get tcp://:9000 (9440 + TLS for
remoteSecure), and the expanded list rides the existing cluster scan
machinery (one Spark input partition per shard)."""

from __future__ import annotations

import pytest

from duckdb_extension_clickhouse_native_spark.sources.table_functions import (
    _remote_urls,
    remote_table,
)


def test_remote_urls_schemeless_defaults():
    assert _remote_urls("h1") == ["tcp://h1:9000"]
    assert _remote_urls("h1:9004") == ["tcp://h1:9004"]
    assert _remote_urls("h1", secure=True) == ["tcp://h1:9440/?secure=true"]
    assert _remote_urls("http://h1:8123") == ["http://h1:8123"]


def test_remote_urls_globs():
    assert _remote_urls("shard{1..3}:9000") == [
        "tcp://shard1:9000", "tcp://shard2:9000", "tcp://shard3:9000",
    ]
    assert _remote_urls("h{a,b}.example") == [
        "tcp://ha.example:9000", "tcp://hb.example:9000",
    ]
    with pytest.raises(ValueError, match="at least one address"):
        _remote_urls(" ")


def test_cluster_option_expands_globs():
    from duckdb_extension_clickhouse_native_spark.sources.scan_datasource import (
        _cluster_urls,
    )

    assert _cluster_urls({"cluster": "http://h{1..2}:8123"}) == [
        "http://h1:8123", "http://h2:8123",
    ]
    assert _cluster_urls({}) == []


def test_remote_table_two_shards(spark):
    from duckdb_extension_clickhouse_native_spark.sources.mock_server import (
        mock_clickhouse_cluster,
    )

    urls = mock_clickhouse_cluster("/root/testdata/sf0.001", 2)
    df = remote_table(spark, ",".join(urls), "nation")
    assert df.rdd.getNumPartitions() == 2
    assert df.count() == 25  # union of disjoint shards == whole table


def test_remote_table_glob_addresses(spark):
    """A consecutive-port glob spelling reaches both mock shards —
    binding two adjacent ports explicitly (retry a few base ports; the
    mock cluster normally picks random free ports)."""
    import socket

    import duckdb
    import pyarrow.parquet as pq

    from duckdb_extension_clickhouse_native_spark.sources.mock_server import (
        build_handler,
    )
    from http.server import ThreadingHTTPServer
    import threading

    sf = "/root/testdata/sf0.001"

    def try_pair():
        s = socket.socket()
        s.bind(("127.0.0.1", 0))
        p0 = s.getsockname()[1]
        s.close()
        servers = []
        try:
            for shard, port in enumerate((p0, p0 + 1)):
                con = duckdb.connect()
                t = pq.read_table(f"{sf}/nation.parquet")
                con.register("nation_full", t)
                con.execute(
                    "CREATE VIEW nation AS SELECT * FROM nation_full "
                    f"WHERE (n_nationkey % 2 + 2) % 2 = {shard}"
                )
                srv = ThreadingHTTPServer(
                    ("127.0.0.1", port), build_handler(con)
                )
                threading.Thread(
                    target=srv.serve_forever, daemon=True
                ).start()
                servers.append(srv)
            return p0
        except OSError:
            for s_ in servers:
                s_.shutdown()
            return None

    p0 = None
    for _ in range(5):
        p0 = try_pair()
        if p0 is not None:
            break
    if p0 is None:
        pytest.skip("could not bind two adjacent ports")
    df = remote_table(
        spark, f"http://127.0.0.1:{{{p0}..{p0 + 1}}}", "nation"
    )
    assert df.rdd.getNumPartitions() == 2
    assert df.count() == 25


def test_remote_table_unsafe_name_refused(spark):
    with pytest.raises(ValueError, match="unsafe"):
        remote_table(spark, "http://127.0.0.1:1", "orders; DROP TABLE x")


def test_remote_table_entry_matches_oracle(spark):
    import duckdb

    import __spark_entry__ as e

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM '{sf}/orders.parquet'")
    name = "tf_remote_table"
    srows = sorted(map(tuple, e.queries()[name](spark, sf).collect()))
    orows = sorted(map(tuple, con.execute(e.oracle_sql()[name]).fetchall()))
    assert srows == orows and len(srows) >= 1
