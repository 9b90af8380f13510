#!/usr/bin/env python
"""Measure the r15 s3() INSERT PARTITION BY fan-out at scan scale:
one object per partition value via groupBy().applyInArrow — the claim
to verify is that the write is DISTRIBUTED (wall-clock bounded by the
one hash shuffle + the per-task encode, NOT by a single writer) and
that object count scales without a driver-side data path.

Run: python tools/s3_insert_scale_probe.py [--write]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_ROWS = 4_000_000
RUNS = 3


def main() -> None:
    from pyspark.sql import functions as F

    from duckdb_extension_clickhouse_native_spark import get_spark
    from duckdb_extension_clickhouse_native_spark.sources.s3_table import (
        s3_insert,
        s3_table,
    )

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="chsql-s3ins-probe", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    df = spark.range(N_ROWS).select(
        F.col("id").alias("k"),
        (F.col("id") % 997).cast("double").alias("v"),
    )

    lines = []
    for n_parts in (1, 16, 64, 256):
        dfp = df.withColumn(
            "grp", (F.col("k") % n_parts).cast("string")
        )
        ts = []
        n = 0
        for _ in range(RUNS):
            d = tempfile.mkdtemp(prefix="chsql_s3ins_probe")
            t0 = time.perf_counter()
            n = s3_insert(
                dfp,
                f"file://{d}/part_{{_partition_id}}.csv.zst",
                partition_by="grp",
            )
            ts.append(time.perf_counter() - t0)
            objects = len(os.listdir(d))
            assert objects == n_parts, (objects, n_parts)
            shutil.rmtree(d, ignore_errors=True)
        assert n == N_ROWS
        ts.sort()
        med = ts[len(ts) // 2]
        lines.append(
            f"| {n_parts} | {med:.2f} s | {N_ROWS / med / 1e6:.1f} M rows/s |"
        )
        print(f"# {n_parts} partitions: {lines[-1]}", file=sys.stderr)

    # read-back sanity at the widest fan-out
    d = tempfile.mkdtemp(prefix="chsql_s3ins_probe")
    s3_insert(
        df.withColumn("grp", (F.col("k") % 64).cast("string")),
        f"file://{d}/part_{{_partition_id}}.csv.zst",
        partition_by="grp",
    )
    back = s3_table(spark, f"file://{d}/part_*.csv.zst")
    assert back.count() == N_ROWS
    shutil.rmtree(d, ignore_errors=True)

    header = (
        f"\n## s3() INSERT PARTITION BY fan-out ({N_ROWS / 1e6:.0f}M rows, "
        f"local[{cpus}], median of {RUNS}) — r15\n\n"
        "One zstd object per partition value (groupBy + applyInArrow —\n"
        "each value's encode+write is its own task). Wall-clock should\n"
        "be roughly FLAT as values grow (the shuffle dominates; more\n"
        "values = more concurrent writers, not more total work) until\n"
        "per-object overhead shows at very high counts.\n\n"
        "| partition values | insert wall-clock | rows/s |\n"
        "|---|---|---|\n"
    )
    block = header + "\n".join(lines) + "\n"
    print(block)
    if "--write" in sys.argv:
        with open(os.path.join(REPO, "SCALE.md"), "a") as f:
            f.write(block)
        print("# appended to SCALE.md", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
