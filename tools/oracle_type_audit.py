#!/usr/bin/env python
"""Audit every registered DuckDB oracle's RESULT TYPES.

The driver's fetch path canonicalizes some DuckDB types lossily before
hashing, so bit-identical values still hash-mismatch against Spark:

* DECIMAL  -> r1: 12 red rows (fixed by casting final columns to DOUBLE)
* HUGEINT  -> r2: 6 red rows (DuckDB SUM(BIGINT) returns INT128, the
  driver decays it to float64 while Spark emits int64)
* LIST     -> r5: 1 red row (the canonicalizer sort_values/factorize
  step throws `unhashable type: 'list'` on array-typed cells —
  serialize arrays to a string, e.g. array_to_string(list_sort(...)))

Rule: every oracle result column must be a SCALAR one of {BIGINT,
INTEGER, SMALLINT, TINYINT, DOUBLE, VARCHAR, DATE, TIMESTAMP,
TIMESTAMP_NS, BOOLEAN}. HUGEINT/UHUGEINT/DECIMAL/FLOAT are rejected:
wrap the offending aggregate in CAST(... AS BIGINT) / CAST(... AS
DOUBLE) in the ORACLE SQL (the Spark side already emits the 64-bit
type). LIST/ARRAY/STRUCT/MAP are rejected outright: the driver cannot
hash them — serialize to VARCHAR in the final projection on BOTH sides.

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
    """Only allowed SCALAR types pass. Composites (LIST/ARRAY/STRUCT/
    MAP) are rejected outright — the driver's canonicalizer cannot sort
    or hash them (r5: pandas factorize raises on list cells)."""
    up = type_str.upper()
    if re.search(r"\[\]|\bLIST\b|\bARRAY\b|\bSTRUCT\b|\bMAP\b|\bUNION\b", up):
        return False
    if re.search(r"HUGEINT|UHUGEINT|DECIMAL\(\d+,\s*\d+\)|FLOAT|REAL|UBIGINT", up):
        return False
    return up in ALLOWED


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
