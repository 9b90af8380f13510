"""Guard against driver-lossy oracle result types.

Three rounds lost queries to the same trap family: the driver's DuckDB
fetch path canonicalizes some types lossily before hashing (r1:
DECIMAL, r2: HUGEINT — ``SUM(BIGINT)`` returns INT128, decayed to
float64 while Spark emits int64), and its sort/factorize step crashes
on non-hashable cells (r5: LIST — ``unhashable type: 'list'``).

This test runs every registered oracle with LIMIT 0 through DuckDB and
fails if any result column has a type outside the driver-safe SCALAR
set — the fix is CAST(... AS BIGINT/DOUBLE) for numerics, and
array_to_string(list_sort(...)) / concat_ws(',', sort_array(...))
serialization (both dialects) for arrays.
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


def test_type_ok_rejects_composites_and_lossy_scalars():
    from oracle_type_audit import _type_ok

    # r5 trap class: any composite must be rejected
    for t in ["BIGINT[]", "LIST(BIGINT)", "STRUCT(a BIGINT)",
              "MAP(VARCHAR, BIGINT)", "DOUBLE[]", "VARCHAR[]"]:
        assert not _type_ok(t), t
    # r1/r2 trap classes
    for t in ["HUGEINT", "UHUGEINT", "DECIMAL(18,4)", "FLOAT", "UBIGINT"]:
        assert not _type_ok(t), t
    # the driver-safe scalars stay allowed
    for t in ["BIGINT", "INTEGER", "DOUBLE", "VARCHAR", "DATE",
              "TIMESTAMP", "BOOLEAN"]:
        assert _type_ok(t), t
