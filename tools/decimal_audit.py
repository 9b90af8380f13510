"""List every registered query whose FINAL schema contains a DecimalType.

The driver's value-hash canonicalizes decimals differently between its
Spark and DuckDB fetch paths (VERDICT r1: 12/12 checked decimal-emitters
hash-fail with bit-identical values), so no final projection may emit
DecimalType. Inner decimal sums stay (exact, order-independent); only the
last cast changes to DOUBLE.

Usage: python tools/decimal_audit.py [sf_dir]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql.types import DecimalType

import __spark_entry__ as entry_mod


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("decimal-audit")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    bad = {}
    for name, build in entry_mod.queries().items():
        try:
            df = build(spark, sf_dir)
            cols = [f.name for f in df.schema.fields if isinstance(f.dataType, DecimalType)]
            if cols:
                bad[name] = cols
        except Exception as ex:  # schema-only build should not fail
            bad[name] = [f"ERROR: {type(ex).__name__}: {ex}"[:200]]
    for name, cols in bad.items():
        print(f"{name}: {cols}")
    print(f"\n{len(bad)} queries with DecimalType in final schema")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
