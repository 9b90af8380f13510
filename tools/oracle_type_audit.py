#!/usr/bin/env python
"""Audit every registered DuckDB oracle's RESULT TYPES.

The driver's fetch path canonicalizes some DuckDB types lossily before
hashing, so bit-identical values still hash-mismatch against Spark:

* DECIMAL  -> r1: 12 red rows (fixed by casting final columns to DOUBLE)
* HUGEINT  -> r2: 6 red rows (DuckDB SUM(BIGINT) returns INT128, the
  driver decays it to float64 while Spark emits int64)

Rule: every oracle result column must be one of {BIGINT, INTEGER,
SMALLINT, TINYINT, DOUBLE, VARCHAR, DATE, TIMESTAMP, TIMESTAMP_NS,
BOOLEAN, or a LIST/STRUCT thereof}. HUGEINT/UHUGEINT/DECIMAL/FLOAT
are rejected: wrap the offending aggregate in CAST(... AS BIGINT) /
CAST(... AS DOUBLE) in the ORACLE SQL (the Spark side already emits
the 64-bit type).

Runs DuckDB only (no Spark) — LIMIT 0 per oracle, so it is fast enough
for pytest. Usage: python tools/oracle_type_audit.py [sf_dir]
"""
from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

ALLOWED = {
    "BIGINT",
    "INTEGER",
    "SMALLINT",
    "TINYINT",
    "UINTEGER",
    "USMALLINT",
    "UTINYINT",
    "DOUBLE",
    "VARCHAR",
    "DATE",
    "TIMESTAMP",
    "TIMESTAMP_NS",
    "TIMESTAMP WITH TIME ZONE",
    "BOOLEAN",
    "INTERVAL",
}


def _type_ok(type_str: str) -> bool:
    """A composite (LIST/STRUCT/MAP) is fine iff every scalar leaf it
    mentions is allowed — extract leaf type words and check each."""
    leaves = re.findall(
        r"HUGEINT|UHUGEINT|DECIMAL\(\d+,\s*\d+\)|FLOAT|REAL|UBIGINT", type_str.upper()
    )
    return not leaves and any(a in type_str.upper() for a in ALLOWED) or (
        not leaves and type_str.upper() in ALLOWED
    )


def audit(sf_dir: str) -> dict[str, list[str]]:
    import __spark_entry__ as entry_mod
    from oracle_harness import duckdb_connection

    con = duckdb_connection(sf_dir)
    bad: dict[str, list[str]] = {}
    for name, sql in entry_mod.oracle_sql().items():
        try:
            rel = con.sql(f"SELECT * FROM ({sql}) LIMIT 0")
            offending = [
                f"{c}:{t}"
                for c, t in zip(rel.columns, [str(t) for t in rel.types])
                if not _type_ok(str(t))
            ]
            if offending:
                bad[name] = offending
        except Exception as ex:
            bad[name] = [f"ERROR: {type(ex).__name__}: {ex}"[:200]]
    return bad


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    bad = audit(sf_dir)
    for name, cols in sorted(bad.items()):
        print(f"{name}: {cols}")
    print(f"\n{len(bad)} oracles with driver-lossy result types")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
