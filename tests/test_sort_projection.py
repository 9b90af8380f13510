"""Sort-key projections: build/route/prune, staleness on source
churn (including lightweight deletes), append-only incremental
refresh, and rebuild on mutation."""

from __future__ import annotations

import os

import pyarrow as pa

from duckdb_extension_clickhouse_native_spark.native.writer import (
    write_native_file,
)
from duckdb_extension_clickhouse_native_spark.operators.mutations import (
    lightweight_delete,
)
from duckdb_extension_clickhouse_native_spark.operators.projections import (
    add_sort_projection,
    drop_sort_projection,
    refresh_sort_projection,
    sort_projection_scan,
)


def _mkdir(tmp_path, n_parts=8, rows=64):
    """Time-sliced parts: every part spans the whole key range, so a
    key probe cannot prune the base layout."""
    d = str(tmp_path / "tbl")
    os.makedirs(d, exist_ok=True)
    for i in range(n_parts):
        t = pa.table(
            {
                "k": pa.array(
                    [x % 16 for x in range(rows)], pa.int64()
                ),
                "v": pa.array(
                    [i * rows + x for x in range(rows)], pa.int64()
                ),
            }
        )
        write_native_file(os.path.join(d, f"part-{i}.clickhouse"), t)
    return d


def test_build_route_prune(spark, tmp_path):
    d = _mkdir(tmp_path)
    res = add_sort_projection(spark, d, "by_k", order_by=["k"])
    assert res["built"] and res["parts"] == 8
    # idempotent second build
    assert not add_sort_projection(spark, d, "by_k", order_by=["k"])["built"]
    df, used = sort_projection_scan(spark, d, "k")
    assert used == "by_k"
    probe = df.filter(df.k == 5)
    assert probe.rdd.getNumPartitions() <= 2  # vs 8 unprunable base parts
    assert probe.count() == 8 * 4  # 4 rows of k==5 per part
    # no projection on another column: plain scan
    _df2, used2 = sort_projection_scan(spark, d, "v")
    assert used2 is None


def test_stale_on_delete_and_rebuild(spark, tmp_path):
    d = _mkdir(tmp_path)
    add_sort_projection(spark, d, "by_k", order_by=["k"])
    lightweight_delete(spark, d, [("k", "=", 5)])
    _df, used = sort_projection_scan(spark, d, "k")
    assert used is None  # mask stamp changed the fingerprint: stale
    res = refresh_sort_projection(spark, d, "by_k")
    assert res["mode"] == "rebuild"
    df, used2 = sort_projection_scan(spark, d, "k")
    assert used2 == "by_k"
    assert df.count() == 8 * 64 - 8 * 4  # deletions materialized


def test_incremental_append(spark, tmp_path):
    d = _mkdir(tmp_path, n_parts=4)
    add_sort_projection(spark, d, "by_k", order_by=["k"])
    t = pa.table(
        {
            "k": pa.array([x % 16 for x in range(64)], pa.int64()),
            "v": pa.array(range(64), pa.int64()),
        }
    )
    write_native_file(os.path.join(d, "part-new.clickhouse"), t)
    res = refresh_sort_projection(spark, d, "by_k")
    assert res["mode"] == "incremental" and res["new_parts"] == 1
    df, used = sort_projection_scan(spark, d, "k")
    assert used == "by_k"
    assert df.count() == 5 * 64
    assert refresh_sort_projection(spark, d, "by_k")["mode"] == "noop"
    drop_sort_projection(d, "by_k")
    _df, used2 = sort_projection_scan(spark, d, "k")
    assert used2 is None
