"""Minimal clean-room ClickHouse client over the public HTTP interface.

The reference's ``clickhouse_scan`` ships SQL over the native TCP
protocol via the clickhouse-rs crate (/root/reference/src/
clickhouse_scan.rs:47-265). We use the equally-public HTTP interface
(default port 8123) and ask the server for ``FORMAT Native`` — so the
response is parsed by the same codec as our file reader, typed
end-to-end. This deliberately avoids the reference's
stringify-then-reparse path (clickhouse_scan.rs:134-157,212-240).

Connection resolution mirrors the reference (clickhouse_scan.rs:55-71):
explicit option > ``CLICKHOUSE_URL`` / ``CLICKHOUSE_USER`` /
``CLICKHOUSE_PASSWORD`` env vars > default localhost. ``tcp://`` URLs
(the reference's scheme) are transparently remapped to HTTP ports.
"""

from __future__ import annotations

import io
import os
import urllib.parse
import urllib.request
from dataclasses import dataclass
from typing import BinaryIO, Iterator, Optional

DEFAULT_URL = "http://localhost:8123"


@dataclass
class ConnectionInfo:
    base_url: str
    user: Optional[str] = None
    password: Optional[str] = None
    database: Optional[str] = None


def resolve_connection(options: dict) -> ConnectionInfo:
    url = options.get("url") or os.environ.get("CLICKHOUSE_URL") or DEFAULT_URL
    database = options.get("database")

    if "://" not in url:
        # scheme-less 'host:port' would otherwise parse as scheme='host'
        # with an empty hostname and silently fall back to localhost
        url = "http://" + url
    parsed = urllib.parse.urlsplit(url)
    scheme = parsed.scheme or "http"
    host = parsed.hostname or "localhost"
    port = parsed.port
    qs = dict(urllib.parse.parse_qsl(parsed.query))
    secure = qs.get("secure", "false").lower() == "true"
    # per-field precedence: explicit option > URL-embedded > env — env
    # must never override credentials the user wrote into the URL
    user = (
        options.get("user") or parsed.username or os.environ.get("CLICKHOUSE_USER")
    )
    password = (
        options.get("password")
        or parsed.password
        or os.environ.get("CLICKHOUSE_PASSWORD")
    )

    if scheme == "tcp":
        # reference-style native-protocol URL: map to the HTTP interface
        scheme = "https" if secure or port == 9440 else "http"
        port = 8443 if scheme == "https" else 8123
    if port is None:
        port = 8443 if scheme == "https" else 8123
    return ConnectionInfo(
        base_url=f"{scheme}://{host}:{port}", user=user, password=password, database=database
    )


class ClickHouseHTTPClient:
    def __init__(self, conn: ConnectionInfo, timeout: float = 300.0):
        self.conn = conn
        self.timeout = timeout

    def _request(self, query: str, body: Optional[bytes] = None) -> BinaryIO:
        params: dict[str, str] = {}
        if self.conn.database:
            params["database"] = self.conn.database
        if body is not None:
            params["query"] = query
        url = self.conn.base_url + "/"
        if params:
            url += "?" + urllib.parse.urlencode(params)
        data = body if body is not None else query.encode("utf-8")
        req = urllib.request.Request(url, data=data, method="POST")
        if self.conn.user:
            req.add_header("X-ClickHouse-User", self.conn.user)
        if self.conn.password:
            req.add_header("X-ClickHouse-Key", self.conn.password)
        return urllib.request.urlopen(req, timeout=self.timeout)

    def execute_native(self, query: str) -> BinaryIO:
        """Run a SELECT with ``FORMAT Native``; returns the raw stream
        (feed to ``native.codec.iter_blocks``)."""
        import re

        q = query.rstrip().rstrip(";").rstrip()
        # only a trailing "FORMAT <name>" clause counts — a substring
        # match would false-positive on formatDateTime(...), a column
        # named "format", etc., and the server would answer TabSeparated
        if not re.search(r"\bFORMAT\s+\w+$", q, re.IGNORECASE):
            q = f"{q} FORMAT Native"
        return self._request(q)

    def insert_native(self, table: str, payload: bytes) -> None:
        """INSERT via Native-format body (the write path the reference
        lacks)."""
        self._request(f"INSERT INTO {table} FORMAT Native", body=payload).read()

    def ping(self) -> bool:
        try:
            req = urllib.request.Request(self.conn.base_url + "/ping")
            with urllib.request.urlopen(req, timeout=5.0) as r:
                return r.read().strip() == b"Ok."
        except Exception:
            return False


def schema_probe_query(query: str) -> str:
    """Zero-row schema probe — fixes the reference's execute-twice
    lifecycle (clickhouse_scan.rs:78 + :131)."""
    q = query.rstrip().rstrip(";")
    return f"SELECT * FROM ({q}) AS __schema_probe WHERE 0 = 1"
