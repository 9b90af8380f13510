"""Local re-implementation of the driver's correctness gate: run the
Spark build and the DuckDB oracle side by side, sort columns by name,
compare row-count + order-insensitive canonical values."""

from __future__ import annotations

import datetime
import decimal
import math
from typing import Any

import duckdb

from duckdb_extension_clickhouse_native_spark.plans.base import TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _canon(v: Any) -> Any:
    if v is None:
        return None
    if isinstance(v, decimal.Decimal):
        return ("dec", str(v.normalize()))
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        return ("f", repr(v))
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, datetime.datetime):
        if v.tzinfo is not None:
            # normalize to UTC before dropping tzinfo — stripping a
            # non-UTC offset would canonicalize to local wall time
            v = v.astimezone(datetime.timezone.utc)
        return ("ts", v.replace(tzinfo=None).isoformat())
    if isinstance(v, datetime.date):
        return ("d", v.isoformat())
    if isinstance(v, (list, tuple)):
        return ("l", tuple(_canon(x) for x in v))
    return ("s", str(v))


def canonical_rows(col_names: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(col_names)), key=lambda i: col_names[i])
    out = [tuple(_canon(r[i]) for i in order) for r in rows]
    out.sort(key=repr)
    return out


def compare(spark_df, con: duckdb.DuckDBPyConnection, oracle_sql: str) -> tuple[bool, str]:
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = spark_df.columns
    rel = con.execute(oracle_sql)
    o_cols = [d[0] for d in rel.description]
    o_rows = rel.fetchall()
    if sorted(s_cols) != sorted(o_cols):
        return False, f"column mismatch: spark={sorted(s_cols)} oracle={sorted(o_cols)}"
    if len(s_rows) != len(o_rows):
        return False, f"row count: spark={len(s_rows)} oracle={len(o_rows)}"
    cs = canonical_rows(s_cols, s_rows)
    co = canonical_rows(o_cols, o_rows)
    if cs != co:
        diffs = [(a, b) for a, b in zip(cs, co) if a != b][:3]
        return False, f"value mismatch, first diffs: {diffs}"
    return True, f"ok ({len(s_rows)} rows)"
