"""Connection-resolution tests for the clickhouse_scan client:
precedence (option > URL-embedded > env), tcp:// transport selection,
and scheme-less URLs (reference env fallbacks: clickhouse_scan.rs:55-71)."""

from __future__ import annotations

import pytest

from duckdb_extension_clickhouse_native_spark.sources.http_client import (
    resolve_connection,
)


@pytest.fixture(autouse=True)
def _clean_env(monkeypatch):
    for k in ("CLICKHOUSE_URL", "CLICKHOUSE_USER", "CLICKHOUSE_PASSWORD"):
        monkeypatch.delenv(k, raising=False)


def test_url_credentials_beat_env(monkeypatch):
    monkeypatch.setenv("CLICKHOUSE_USER", "envuser")
    monkeypatch.setenv("CLICKHOUSE_PASSWORD", "envpass")
    c = resolve_connection({"url": "http://alice:secret@h:8123"})
    assert c.user == "alice" and c.password == "secret"


def test_option_credentials_beat_url():
    c = resolve_connection(
        {"url": "http://alice:secret@h:8123", "user": "bob", "password": "pw"}
    )
    assert c.user == "bob" and c.password == "pw"


def test_env_used_when_nothing_else(monkeypatch):
    monkeypatch.setenv("CLICKHOUSE_USER", "envuser")
    c = resolve_connection({"url": "http://h:8123"})
    assert c.user == "envuser"


def test_scheme_less_url_gets_http():
    c = resolve_connection({"url": "myhost:9999"})
    assert c.base_url.startswith("http://myhost:9999")


def test_tcp_url_selects_native_transport():
    c = resolve_connection({"url": "tcp://ch.example.com:9000"})
    assert c.transport == "tcp"
    assert (c.host, c.port, c.secure) == ("ch.example.com", 9000, False)


def test_tcp_default_port():
    c = resolve_connection({"url": "tcp://ch.example.com"})
    assert c.transport == "tcp" and c.port == 9000


def test_tcp_secure_defaults_to_9440():
    c = resolve_connection({"url": "tcp://ch.example.com?secure=true"})
    assert c.transport == "tcp" and c.port == 9440 and c.secure


def test_tcp_port_9440_implies_tls():
    c = resolve_connection({"url": "tcp://ch.example.com:9440"})
    assert c.transport == "tcp" and c.secure


def test_clickhouse_scheme_is_tcp():
    c = resolve_connection({"url": "clickhouse://u:p@ch.example.com:9000"})
    assert c.transport == "tcp" and c.user == "u" and c.password == "p"


def test_http_url_stays_http():
    c = resolve_connection({"url": "http://h:8123"})
    assert c.transport == "http"


def test_default_localhost():
    c = resolve_connection({})
    assert c.base_url.startswith("http://localhost:8123")
    assert c.transport == "http"
