"""Atomic catalog ops (operators/catalog.py): EXCHANGE TABLES swap,
delayed DROP + UNDROP generations, purge cutoff."""

from __future__ import annotations

import os

import pytest

from duckdb_extension_clickhouse_native_spark.operators.catalog import (
    drop_table,
    exchange_tables,
    purge_dropped,
    undrop_table,
)


def _write(spark, path, n):
    (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .limit(n)
        .coalesce(1)
        .write.format("clickhouse_native")
        .mode("overwrite")
        .save(path)
    )


def _count(spark, path):
    return spark.read.format("clickhouse_native").load(path).count()


def test_exchange_swaps_atomically(spark, tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    _write(spark, a, 100)
    _write(spark, b, 250)
    exchange_tables(a, b)
    assert _count(spark, a) == 250 and _count(spark, b) == 100
    with pytest.raises(ValueError, match="itself"):
        exchange_tables(a, a)
    with pytest.raises(ValueError, match="existing"):
        exchange_tables(a, str(tmp_path / "nope"))


def test_drop_undrop_generations(spark, tmp_path):
    t = str(tmp_path / "t")
    _write(spark, t, 100)
    drop_table(t, now_fn=lambda: 1.0)
    assert not os.path.exists(t)
    _write(spark, t, 250)  # a new table under the same name
    drop_table(t, now_fn=lambda: 2.0)
    undrop_table(t)  # restores the MOST RECENT generation
    assert _count(spark, t) == 250
    with pytest.raises(ValueError, match="refuses to overwrite"):
        undrop_table(t)
    drop_table(t, now_fn=lambda: 3.0)
    undrop_table(t)
    assert _count(spark, t) == 250
    # the 1.0 generation is still in the trash
    undroppable = os.listdir(str(tmp_path / ".trash"))
    assert len(undroppable) == 1


def test_purge_cutoff(spark, tmp_path):
    t = str(tmp_path / "t")
    _write(spark, t, 50)
    drop_table(t, now_fn=lambda: 100.0)
    _write(spark, t, 50)
    drop_table(t, now_fn=lambda: 10000.0)
    # purge at t=12000 with 8h window: nothing old enough
    assert purge_dropped(str(tmp_path), now_fn=lambda: 12000.0) == 0
    # shrink the window: only the 100.0 generation is older than 5000 s
    assert (
        purge_dropped(str(tmp_path), older_than=5000, now_fn=lambda: 10001.0)
        == 1
    )
    assert undrop_table(t) and _count(spark, t) == 50


def test_truncate_table_keeps_metadata_and_is_undropable(spark, tmp_path):
    import os

    import pyarrow.parquet as pq

    from duckdb_extension_clickhouse_native_spark.native.writer import (
        write_native_file,
    )
    from duckdb_extension_clickhouse_native_spark.operators.catalog import (
        truncate_table,
    )
    from duckdb_extension_clickhouse_native_spark.operators.rowpolicy import (
        create_row_policy,
        list_row_policies,
    )

    d = str(tmp_path / "t")
    os.makedirs(d)
    t = pq.read_table("/root/testdata/sf0.001/nation.parquet")
    write_native_file(os.path.join(d, "p.clickhouse"), t)
    create_row_policy(d, "pol", "n_regionkey = 1", to_users=["u"])
    clock = [1_700_000_000.0]
    trash = truncate_table(d, now_fn=lambda: clock[0])
    # table dir survives, policies survive, data gone
    assert os.path.isdir(d)
    assert [p["name"] for p in list_row_policies(d)] == ["pol"]
    assert not any(f.endswith(".clickhouse") for f in os.listdir(d))
    # the trashed generation holds the parts (UNDROP-able until purge)
    assert any(f.endswith(".clickhouse") for f in os.listdir(trash))
    # the empty table is still writable in place
    write_native_file(os.path.join(d, "p2.clickhouse"), t.slice(0, 5))
    n = spark.read.format("clickhouse_native").load(d).count()
    assert n == 5


def test_truncate_same_millisecond_no_collision(spark, tmp_path):
    """Two truncates under one frozen clock must land in distinct
    trash generations instead of FileExistsError (ADVICE r12)."""
    import os

    import pyarrow.parquet as pq

    from duckdb_extension_clickhouse_native_spark.native.writer import (
        write_native_file,
    )
    from duckdb_extension_clickhouse_native_spark.operators.catalog import (
        truncate_table,
    )

    d = str(tmp_path / "t2")
    os.makedirs(d)
    t = pq.read_table("/root/testdata/sf0.001/nation.parquet")
    write_native_file(os.path.join(d, "p.clickhouse"), t)
    clock = [1_700_000_000.0]
    trash1 = truncate_table(d, now_fn=lambda: clock[0])
    write_native_file(os.path.join(d, "p.clickhouse"), t.slice(0, 3))
    trash2 = truncate_table(d, now_fn=lambda: clock[0])
    assert trash1 != trash2
    assert any(f.endswith(".clickhouse") for f in os.listdir(trash1))
    assert any(f.endswith(".clickhouse") for f in os.listdir(trash2))
