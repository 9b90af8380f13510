"""Precondition for the cents-quantized BIGINT aggregations (q1 r9):
every money/rate column they quantize must be an exact 2-decimal
multiple, or ROUND(x*100) would silently change semantics. Checked at
all three scales so testdata regeneration that breaks the invariant
fails loudly here instead of surfacing as an oracle-parity mystery.

Also pins the equivalence that justified the rewrite: the fixed-point
q1 produces exactly the values of the DECIMAL-accumulation form.
"""

from __future__ import annotations

import duckdb
import pytest

SCALES = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]


@pytest.mark.parametrize("sf_dir", SCALES)
def test_lineitem_columns_are_exact_2dp(sf_dir):
    con = duckdb.connect()
    bad = con.execute(
        f"""
        SELECT
          MAX(ABS(l_quantity * 100 - ROUND(l_quantity * 100))),
          MAX(ABS(l_extendedprice * 100 - ROUND(l_extendedprice * 100))),
          MAX(ABS(l_discount * 100 - ROUND(l_discount * 100))),
          MAX(ABS(l_tax * 100 - ROUND(l_tax * 100)))
        FROM '{sf_dir}/lineitem.parquet'
        """
    ).fetchone()
    # doubles encoding exact 2dp values sit within 1 ulp of the integer
    assert all(v < 1e-6 for v in bad), bad


def test_fixed_point_q1_equals_decimal_form(spark):
    """The r9 rewrite must reproduce the decimal form bit-for-bit."""
    from duckdb_extension_clickhouse_native_spark.plans.base import (
        REGISTRY,
        load_tables,
    )
    from duckdb_extension_clickhouse_native_spark.plans import relational  # noqa: F401

    sf = "/root/testdata/sf0.01"
    load_tables(spark, sf, ["lineitem"])
    new = [tuple(r) for r in REGISTRY.all()["q1_pricing_summary"]
           .build(spark, sf).collect()]
    old = [
        tuple(r)
        for r in spark.sql(
            """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_price,
               CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
        """
        ).collect()
    ]
    assert new == old
