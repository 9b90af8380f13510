"""Guard against driver-lossy oracle result types.

Two rounds lost queries to the same trap: the driver's DuckDB fetch
path canonicalizes some types lossily before hashing (r1: DECIMAL,
r2: HUGEINT — ``SUM(BIGINT)`` returns INT128, decayed to float64
while Spark emits int64). Values compare bit-identical, hashes don't.

This test runs every registered oracle with LIMIT 0 through DuckDB and
fails if any result column has a type outside the driver-safe set —
the fix is always CAST(... AS BIGINT/DOUBLE) in the oracle SQL.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

SF_SMALL = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001")


def test_no_driver_lossy_oracle_types():
    from oracle_type_audit import audit

    bad = audit(SF_SMALL)
    assert not bad, (
        "oracle result columns with driver-lossy types (wrap in "
        f"CAST(... AS BIGINT/DOUBLE) in the ORACLE SQL): {bad}"
    )
