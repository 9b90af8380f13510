#!/usr/bin/env python
"""Session A/B timing harness: time named registry queries with the
bench's exact methodology (noop sink, full warm-up, median-of-N).

Run: python tools/time_queries.py name1,name2,... [runs]
Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    names = sys.argv[1].split(",")
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from duckdb_extension_clickhouse_native_spark import get_spark
    import __spark_entry__  # noqa: F401 - populates REGISTRY
    from duckdb_extension_clickhouse_native_spark.plans.base import REGISTRY

    spark = get_spark(app_name="time-queries", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    from duckdb_extension_clickhouse_native_spark.plans.sources import (
        native_fixture_dir,
    )

    for table in ("lineitem", "orders", "documents"):
        native_fixture_dir(spark, sf_dir, table)
    tiny = native_fixture_dir(spark, sf_dir, "documents")
    spark.read.format("clickhouse_native").load(tiny).limit(1).count()

    def mat(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    all_q = REGISTRY.all()
    for name in names:
        q = all_q[name]
        spark.sparkContext.setJobDescription(f"timeq:{name}")
        mat(q.build(spark, sf_dir))  # untimed full warm-up
        ts = []
        for _ in range(runs):
            t0 = time.perf_counter()
            mat(q.build(spark, sf_dir))
            ts.append(time.perf_counter() - t0)
        ts.sort()
        med = ts[len(ts) // 2]
        print(
            f"{name}: median {med:.3f}s min {ts[0]:.3f} "
            f"all={[round(t, 3) for t in ts]}",
            flush=True,
        )
        spark.sparkContext.setJobDescription(None)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
