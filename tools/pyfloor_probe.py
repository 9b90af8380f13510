#!/usr/bin/env python
"""Python-boundary fixed-cost probe (r15 optimization round): what is
the per-query floor every Python DataSource scan / mapInPandas query
pays, and which knob moves it? Pure measurement, no repo changes.

Run: python tools/pyfloor_probe.py
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def timeit(label, fn, reps=7):
    fn()  # warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    ts.sort()
    print(
        f"{label}: median {ts[len(ts) // 2] * 1000:.0f} ms "
        f"min {ts[0] * 1000:.0f} ms max {ts[-1] * 1000:.0f} ms"
    )
    return ts[len(ts) // 2]


def main() -> None:
    from duckdb_extension_clickhouse_native_spark import get_spark

    spark = get_spark(app_name="pyfloor-probe", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    print("worker.reuse =", spark.conf.get("spark.python.worker.reuse", "<unset>"))
    try:
        print("worker.idle =", spark.conf.get("spark.python.worker.idleTimeoutSeconds", "<unset>"))
    except Exception:
        pass

    def ident(it):
        yield from it

    for n in (32, 8, 1):
        df = spark.range(32_000).repartition(n).mapInPandas(ident, "id long")
        timeit(f"identity mapInPandas {n} tasks (count)", lambda d=df: d.count())

    import pyarrow  # noqa: F401

    def ident_arrow(it):
        yield from it

    df = spark.range(32_000).repartition(32).mapInArrow(ident_arrow, "id long")
    timeit("identity mapInArrow 32 tasks (count)", lambda: df.count())

    # pure JVM control: same shuffle + count without python
    dfj = spark.range(32_000).repartition(32)
    timeit("JVM-only repartition(32).count", lambda: dfj.count())

    # tiny native scan: fixed planning + one python source task
    from duckdb_extension_clickhouse_native_spark.plans.sources import (
        native_fixture_dir,
    )
    from duckdb_extension_clickhouse_native_spark.sources.native_datasource import (
        infer_native_schema,
    )

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    tiny = native_fixture_dir(spark, sf_dir, "documents")
    schema = infer_native_schema({"path": tiny})

    def scan():
        return (
            spark.read.format("clickhouse_native")
            .schema(schema)
            .load(tiny)
            .count()
        )

    timeit("native scan documents (count, schema given)", scan)

    def scan_infer():
        return spark.read.format("clickhouse_native").load(tiny).count()

    timeit("native scan documents (count, schema())", scan_infer)

    # the same relation through parquet (JVM source) for scale
    timeit(
        "parquet documents count (JVM source)",
        lambda: spark.read.parquet(f"{sf_dir}/documents.parquet").count(),
    )

    # DataSource WRITE floor: write documents once through the sink
    import shutil
    import tempfile

    src = spark.read.parquet(f"{sf_dir}/documents.parquet")

    def wr():
        out = tempfile.mkdtemp(prefix="pyfloor_write")
        shutil.rmtree(out)
        src.write.format("clickhouse_native").mode("overwrite").save(out)
        shutil.rmtree(out, ignore_errors=True)

    timeit("native write documents (1 file)", wr, reps=5)

    spark.stop()


if __name__ == "__main__":
    main()
