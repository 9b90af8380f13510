"""SQL table-function invocation shape (reference lib.rs:363-365):
``SELECT * FROM clickhouse_native('path')`` / ``clickhouse_scan('q')``
via Python UDTFs with plan-time schema resolution, plus the
DataSource-backed view helpers (the scale path)."""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest

from conftest import SF_SMALL


@pytest.fixture(scope="module")
def native_file(tmp_path_factory):
    from duckdb_extension_clickhouse_native_spark.native.writer import (
        write_native_file,
    )

    p = tmp_path_factory.mktemp("tf") / "orders.clickhouse"
    t = pq.read_table(f"{SF_SMALL}/orders.parquet")
    write_native_file(str(p), t, block_rows=500)
    return str(p)


def test_udtf_native_agg(spark, native_file):
    row = spark.sql(
        f"SELECT count(*) AS n, max(o_orderkey) AS mx "
        f"FROM clickhouse_native('{native_file}')"
    ).collect()[0]
    assert (row.n, row.mx) == (1500, 1499)


def test_udtf_native_schema_at_plan_time(spark, native_file):
    df = spark.sql(f"SELECT * FROM clickhouse_native('{native_file}')")
    assert "o_orderkey" in df.columns and "o_totalprice" in df.columns


def test_udtf_native_requires_literal(spark, native_file):
    with pytest.raises(Exception, match="literal|foldable|constant"):
        spark.sql(
            "SELECT * FROM clickhouse_native(CAST(rand() AS STRING))"
        ).collect()


def test_udtf_scan_remote(spark):
    # env vars don't reach Spark's separate planner/executor Python
    # workers, so the URL rides as the optional second literal argument
    # (the reference similarly accepts explicit connection params)
    from duckdb_extension_clickhouse_native_spark.sources.mock_tcp_server import (
        mock_clickhouse_tcp_url,
    )

    url = mock_clickhouse_tcp_url(SF_SMALL)
    row = spark.sql(
        "SELECT * FROM clickhouse_scan("
        f"'SELECT COUNT(*) AS n FROM orders', '{url}')"
    ).collect()[0]
    assert row.n == 1500


def test_view_helpers(spark, native_file):
    from duckdb_extension_clickhouse_native_spark.sources.table_functions import (
        clickhouse_native_view,
    )

    df = clickhouse_native_view(spark, native_file, "tf_orders_view")
    assert df.count() == 1500
    assert spark.sql("SELECT COUNT(*) AS n FROM tf_orders_view").collect()[0].n == 1500


def test_native_parts_udtf_metadata_and_missing_sidecar(spark, tmp_path):
    import os

    import pyarrow as pa

    from duckdb_extension_clickhouse_native_spark.native.writer import (
        stats_sidecar_path,
        write_native_file,
    )

    d = str(tmp_path)
    for i, n in enumerate((7, 3)):
        t = pa.table({"a": pa.array(range(n), type=pa.int64()),
                      "b": pa.array([f"x{j}" for j in range(n)])})
        write_native_file(os.path.join(d, f"part-{i}.clickhouse"), t,
                          block_rows=2)
    # strip the second sidecar: rows must report -1 (unknown), not scan
    os.remove(stats_sidecar_path(os.path.join(d, "part-1.clickhouse")))
    rows = {
        r.part_name: (r.rows, r.n_blocks, r.n_cols, r.bytes > 0)
        for r in spark.sql(
            f"SELECT * FROM clickhouse_native_parts('{d}')"
        ).collect()
    }
    assert rows == {
        "part-0.clickhouse": (7, 4, 2, True),  # ceil(7/2) = 4 blocks
        "part-1.clickhouse": (-1, -1, -1, True),
    }


def test_columns_udtf_describes_schema(spark, tmp_path):
    """clickhouse_native_columns: header-only DESCRIBE, including the
    Nullable(...) rendering for nullable columns."""
    import pyarrow as pa

    from duckdb_extension_clickhouse_native_spark.native.writer import (
        write_native_file,
    )
    from duckdb_extension_clickhouse_native_spark.plans.base import (
        ensure_session,
    )

    ensure_session(spark)
    p = str(tmp_path / "t.clickhouse")
    t = pa.table(
        {
            "k": pa.array([1, 2], type=pa.int32()),
            "s": pa.array(["a", None]),  # null -> Nullable(String)
        }
    )
    write_native_file(p, t)
    rows = spark.sql(
        f"SELECT * FROM clickhouse_native_columns('{p}') ORDER BY position"
    ).collect()
    assert [tuple(r) for r in rows] == [
        ("k", 1, "Int32", "int", False),
        ("s", 2, "Nullable(String)", "string", True),
    ]
