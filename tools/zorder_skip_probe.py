#!/usr/bin/env python
"""Z-order + data-skipping probe: how many Native files does a 2-D box
predicate actually READ under three physical layouts of the same
events data?

* arrival   — rows in event_id order (no locality)
* by_user   — sorted by user_id (1-D clustering)
* zorder    — Morton-interleaved (user bucket, minute bucket)

Each layout is written as 32 Native part files through
``write_native_file`` (which emits the min/max skipping sidecars); the
probe then plans ``user_id BETWEEN ... AND minute BETWEEN ...`` reads
and counts surviving partitions. The z-order claim at 100 TB: box
queries touch O(box perimeter) files instead of all of them, and the
skipping sidecars are what turn the layout into actual pruned I/O.

Appends a section to SCALE.md. Usage: python tools/zorder_skip_probe.py
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_FILES = 32
BITS = 8  # 8-bit keys per dimension, as in operators/zorder.py


def main() -> None:
    import pyarrow as pa

    from pyspark.sql import functions as F
    from pyspark.sql.datasource import GreaterThanOrEqual, LessThanOrEqual

    from duckdb_extension_clickhouse_native_spark import get_spark
    from duckdb_extension_clickhouse_native_spark.native.writer import write_native_file
    from duckdb_extension_clickhouse_native_spark.operators.zorder import _zvalue_expr
    from duckdb_extension_clickhouse_native_spark.plans.base import load_tables
    from duckdb_extension_clickhouse_native_spark.sources.native_datasource import (
        ClickHouseNativeReader,
        infer_native_schema,
    )

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="zorder-skip-probe", cpus=16)
    spark.sparkContext.setLogLevel("ERROR")
    t = load_tables(spark, sf, ["events"])
    mask = (1 << BITS) - 1
    base = t["events"].select(
        "event_id",
        F.expr(f"CAST(user_id & {mask} AS BIGINT)").alias("uk"),
        F.expr(
            f"CAST((unix_micros(CAST(ts AS TIMESTAMP)) DIV 60000000) & {mask} AS BIGINT)"
        ).alias("mk"),
        "value",
    )
    zexpr = _zvalue_expr("spark", "uk", "mk", BITS)
    layouts = {
        "arrival": base.orderBy("event_id"),
        "by_user": base.orderBy("uk", "event_id"),
        "zorder": base.withColumn("z", F.expr(zexpr)).orderBy("z", "event_id").drop("z"),
    }
    # box: 1/8 of each dimension's key space
    boxes = {
        "uk 0-31 x mk 0-31": [
            GreaterThanOrEqual(("uk",), 0),
            LessThanOrEqual(("uk",), 31),
            GreaterThanOrEqual(("mk",), 0),
            LessThanOrEqual(("mk",), 31),
        ],
        "uk 100-131 (1-D)": [
            GreaterThanOrEqual(("uk",), 100),
            LessThanOrEqual(("uk",), 131),
        ],
    }
    out_root = os.path.join("/tmp", "chsql_zorder_skip")
    results: dict[str, dict[str, int]] = {}
    n_rows = None
    for name, df in layouts.items():
        d = os.path.join(out_root, name)
        os.makedirs(d, exist_ok=True)
        tab = pa.Table.from_pandas(df.toPandas(), preserve_index=False)
        n_rows = tab.num_rows
        per = (tab.num_rows + N_FILES - 1) // N_FILES
        for i in range(N_FILES):
            piece = tab.slice(i * per, per)
            if piece.num_rows:
                write_native_file(os.path.join(d, f"part-{i:03d}.clickhouse"), piece)
        results[name] = {}
        for box, filters in boxes.items():
            r = ClickHouseNativeReader(
                infer_native_schema({"path": d}), {"path": d}
            )
            list(r.pushFilters(filters))
            results[name][box] = len(r.partitions())
        # cross-layout correctness: same box -> same row count
    counts = {}
    for name in layouts:
        d = os.path.join(out_root, name)
        df = spark.read.format("clickhouse_native").load(d)
        counts[name] = df.filter(
            (F.col("uk") <= 31) & (F.col("mk") <= 31)
        ).count()
    assert len(set(counts.values())) == 1, counts
    lines = [
        "",
        "## Z-order + data skipping: files read for a box predicate",
        "",
        f"Same {n_rows}-row events projection written 3 ways as {N_FILES} "
        "Native files (min/max sidecars on); numbers are the PARTITIONS "
        "the planner keeps after sidecar pruning (out of 32):",
        "",
        "| layout | " + " | ".join(boxes) + " |",
        "|---|" + "---|" * len(boxes),
    ]
    for name in layouts:
        lines.append(
            f"| {name} | "
            + " | ".join(str(results[name][b]) for b in boxes)
            + " |"
        )
    lines += [
        "",
        "Arrival order defeats skipping (every file spans the whole key "
        "space); 1-D sort prunes only its own dimension; the Morton "
        "layout bounds BOTH dimensions per file, so 2-D boxes read a "
        "small fraction of files — the property that turns z-order from "
        "a nice sort into real I/O savings at 100 TB, with the sidecar "
        "stats doing the pruning at zero task cost.",
    ]
    with open(os.path.join(REPO, "SCALE.md"), "a") as f:
        f.write("\n".join(lines) + "\n")
    print("appended z-order skipping section to SCALE.md")
    print(results, counts)
    spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
