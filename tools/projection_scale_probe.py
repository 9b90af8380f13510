#!/usr/bin/env python
"""Measure the MergeTree-projection win (operators/projections.py):
GROUP BY aggregate over a 10M-row / 32-file Native directory answered
from (a) the full scan vs (b) the materialized partial-state
projection, plus the incremental-refresh cost for one appended part.

Appends/refreshes nothing persistent: fixture lives under the same
/tmp scale-probe root as tools/scale_probe.py.

Run: python tools/projection_scale_probe.py
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build_grouped_fixture(n_rows: int, n_files: int, base: str) -> str:
    """Like scale_probe.build_fixture but with a 64-value group key and
    a payload column, so the aggregate is a real grouped reduction."""
    import numpy as np
    import pyarrow as pa

    from duckdb_extension_clickhouse_native_spark.native.writer import (
        write_native_file,
    )

    d = os.path.join(base, f"grouped-{n_rows}-{n_files}")
    if os.path.exists(os.path.join(d, "_DONE")):
        return d
    os.makedirs(d, exist_ok=True)
    per = -(-n_rows // n_files)
    for i in range(n_files):
        start, end = i * per, min((i + 1) * per, n_rows)
        if start >= end:
            break
        ids = np.arange(start, end, dtype=np.int64)
        t = pa.table(
            {
                "g": pa.array((ids * 2654435761) % 64),
                "v": pa.array(ids % 1000),
                "id": pa.array(ids),
            }
        )
        write_native_file(
            os.path.join(d, f"part-{i:03d}.clickhouse"), t, block_rows=65_409
        )
    open(os.path.join(d, "_DONE"), "w").close()
    return d


def main() -> None:
    from pyspark.sql import functions as F

    from duckdb_extension_clickhouse_native_spark import get_spark
    from duckdb_extension_clickhouse_native_spark.operators.projections import (
        add_projection,
        drop_projection,
        query_projection_aware,
        refresh_projection,
    )

    spark = get_spark(app_name="projection-probe", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    base = os.path.join(tempfile.gettempdir(), "chsql_scale_probe")
    d = build_grouped_fixture(10_000_000, 32, base)
    drop_projection(d, "by_g")

    aggs = {
        "n": ("count", None),
        "total": ("sum", "v"),
        "lo": ("min", "id"),
        "hi": ("max", "id"),
    }

    def timed(fn):
        t0 = time.perf_counter()
        out = fn()
        return out, time.perf_counter() - t0

    # full scan (no projection exists yet)
    (df0, used0), t_full = timed(
        lambda: query_projection_aware(spark, d, group_by=["g"], aggs=aggs)
    )
    rows_full = sorted((r.g, r.n, r.total) for r in df0.collect())
    assert used0 is None
    _, t_full2 = timed(lambda: df0.collect())

    _, t_build = timed(
        lambda: add_projection(spark, d, "by_g", group_by=["g"], aggs=aggs)
    )

    (df1, used1), t_proj = timed(
        lambda: query_projection_aware(spark, d, group_by=["g"], aggs=aggs)
    )
    rows_proj = sorted((r.g, r.n, r.total) for r in df1.collect())
    assert used1 == "by_g"
    assert rows_full == rows_proj
    _, t_proj2 = timed(lambda: df1.collect())

    # incremental refresh for one appended part
    import numpy as np
    import pyarrow as pa

    from duckdb_extension_clickhouse_native_spark.native.writer import (
        write_native_file,
    )

    from duckdb_extension_clickhouse_native_spark.native.writer import (
        stats_sidecar_path,
    )

    extra = os.path.join(d, "part-extra.clickhouse")
    for p in (extra, stats_sidecar_path(extra)):
        if os.path.exists(p):
            os.remove(p)
    ids = np.arange(10_000_000, 10_312_500, dtype=np.int64)
    write_native_file(
        extra,
        pa.table(
            {
                "g": pa.array((ids * 2654435761) % 64),
                "v": pa.array(ids % 1000),
                "id": pa.array(ids),
            }
        ),
        block_rows=65_409,
    )
    st, t_refresh = timed(lambda: refresh_projection(spark, d, "by_g"))
    assert st["mode"] == "incremental" and st["new_parts"] == 1
    (df2, used2), t_proj3 = timed(
        lambda: query_projection_aware(spark, d, group_by=["g"], aggs=aggs)
    )
    n_total = sum(r.n for r in df2.collect())
    assert used2 == "by_g" and n_total == 10_312_500

    # r11: MUTATE one of the 33 parts in place — the per-part state
    # layout must rebuild ONLY that part's projection partition, so
    # refresh cost tracks touched parts, not table size
    ids = np.arange(10_000_000, 10_312_500, dtype=np.int64)
    write_native_file(
        extra,
        pa.table(
            {
                "g": pa.array((ids * 2654435761) % 64),
                "v": pa.array((ids + 1) % 1000),  # changed payload
                "id": pa.array(ids),
            }
        ),
        block_rows=65_409,
    )
    st2, t_refresh_mut = timed(lambda: refresh_projection(spark, d, "by_g"))
    assert st2["mode"] == "incremental" and st2["changed_parts"] == 1, st2
    (df3, used3), _ = timed(
        lambda: query_projection_aware(spark, d, group_by=["g"], aggs=aggs)
    )
    assert used3 == "by_g" and sum(r.n for r in df3.collect()) == 10_312_500

    print(f"rows=10,312,500 files=33 groups=64")
    print(f"full-scan aggregate:        {t_full:.3f}s (plan+exec), repeat {t_full2:.3f}s")
    print(f"projection build (once):    {t_build:.3f}s")
    print(f"projection-answered query:  {t_proj:.3f}s, repeat {t_proj2:.3f}s")
    print(f"incremental refresh (append 1/33 parts): {t_refresh:.3f}s")
    print(f"incremental refresh (MUTATE 1/33 parts): {t_refresh_mut:.3f}s")
    print(f"query after refresh:        {t_proj3:.3f}s")
    # cleanup the appended part so repeat runs start from 32 parts
    for p in (extra, stats_sidecar_path(extra)):
        if os.path.exists(p):
            os.remove(p)
    drop_projection(d, "by_g")
    spark.stop()


if __name__ == "__main__":
    main()
