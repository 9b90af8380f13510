"""Metadata-only schema evolution (ALTER ADD/DROP/RENAME COLUMN):
alter API guards, mixed-epoch read resolution, byte-skip of dropped
payloads, alias-aware pruning, and the mutation interplay (staged
reads and out_dirs must carry the metadata)."""

from __future__ import annotations

import os

import pyarrow as pa
import pytest

from duckdb_extension_clickhouse_native_spark.native.tableschema import (
    alter_add_column,
    alter_drop_column,
    alter_rename_column,
    load_table_schema,
)
from duckdb_extension_clickhouse_native_spark.native.writer import (
    write_native_file,
)
from duckdb_extension_clickhouse_native_spark.operators.mutations import (
    mutate_native_dir,
)
from duckdb_extension_clickhouse_native_spark.sources.native_datasource import (
    infer_native_schema,
)


def _mkdir(tmp_path, n_parts=2, rows=50):
    d = str(tmp_path / "tbl")
    os.makedirs(d, exist_ok=True)
    for i in range(n_parts):
        t = pa.table(
            {
                "k": pa.array(
                    range(i * rows, i * rows + rows), pa.int64()
                ),
                "v": pa.array(
                    [float(x % 7) for x in range(rows)], pa.float64()
                ),
                "junk": [f"j{x}" for x in range(rows)],
            }
        )
        write_native_file(os.path.join(d, f"part-{i}.clickhouse"), t)
    return d


def _read(spark, d, **opts):
    r = spark.read.format("clickhouse_native").schema(
        infer_native_schema({"path": d, **opts})
    )
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load(d)


def test_alter_api_guards(tmp_path):
    d = _mkdir(tmp_path)
    alter_add_column(d, "c1", "Int64", default=5)
    with pytest.raises(ValueError, match="already exists"):
        alter_add_column(d, "c1", "Int64")
    with pytest.raises(Exception):
        alter_add_column(d, "c2", "NotAType")
    with pytest.raises(ValueError, match="no such column"):
        alter_drop_column(d, "zzz")
    with pytest.raises(ValueError, match="already exists"):
        alter_rename_column(d, "k", "v")
    meta = load_table_schema(d)
    assert [c["name"] for c in meta["columns"]] == ["k", "v", "junk", "c1"]
    # a name that EXISTED (now an alias) cannot be re-added: old parts
    # still hold its payload and would resolve it
    alter_rename_column(d, "v", "v2")
    with pytest.raises(ValueError, match="already exists"):
        alter_add_column(d, "v", "Float64")


def test_mixed_epoch_resolution(spark, tmp_path):
    d = _mkdir(tmp_path)
    alter_rename_column(d, "v", "price")
    alter_add_column(d, "channel", "String", default="web")
    alter_add_column(d, "note", "String")  # no default -> NULL
    alter_drop_column(d, "junk")
    # new-epoch append in the current table schema
    new = spark.createDataFrame(
        [(1000 + i, float(i), "app", "n") for i in range(5)],
        "k long, price double, channel string, note string",
    )
    new.write.format("clickhouse_native").mode("append").save(d)
    # NB: one fresh load() per filtered assertion — branch-filtering a
    # single Python-DataSource relation trips the shared-reader
    # pushdown trap (tests/test_review_fixes_r10.py)
    df = _read(spark, d)
    assert df.columns == ["k", "price", "channel", "note"]
    assert df.count() == 105
    by_channel = {
        r.channel: r["count"]
        for r in _read(spark, d).groupBy("channel").count().collect()
    }
    assert by_channel == {"web": 100, "app": 5}
    old_rows = _read(spark, d).filter("k < 100 AND note IS NULL")
    assert old_rows.count() == 100
    assert _read(spark, d).filter("price = 3.0").count() > 0


def test_rename_chain_resolves_oldest_epoch(spark, tmp_path):
    d = _mkdir(tmp_path, n_parts=1)
    alter_rename_column(d, "v", "b")
    alter_rename_column(d, "b", "c")
    meta = load_table_schema(d)
    col = [c for c in meta["columns"] if c["name"] == "c"][0]
    assert col["aliases"] == ["b", "v"]
    df = _read(spark, d)
    assert df.select("c").count() == 50


def test_dropped_column_is_byte_skipped(spark, tmp_path):
    d = _mkdir(tmp_path, n_parts=1)
    alter_drop_column(d, "junk")
    df = _read(spark, d)
    assert df.columns == ["k", "v"]
    assert df.count() == 50


def test_alias_aware_pruning(spark, tmp_path):
    # two parts with disjoint k ranges; rename k -> key; a pushed
    # range filter on the NEW name must still prune via old stats
    d = _mkdir(tmp_path, n_parts=2, rows=50)
    alter_rename_column(d, "k", "key")
    df = _read(spark, d).filter("key >= 75")
    assert df.rdd.getNumPartitions() == 1
    assert df.count() == 25


def test_columns_projection_on_renamed(spark, tmp_path):
    d = _mkdir(tmp_path, n_parts=1)
    alter_rename_column(d, "v", "price")
    df = (
        spark.read.format("clickhouse_native")
        .schema(infer_native_schema({"path": d, "columns": "k,price"}))
        .option("columns", "k,price")
        .load(d)
    )
    assert df.columns == ["k", "price"]
    assert df.count() == 50


def test_mutation_on_evolved_dir(spark, tmp_path):
    d = _mkdir(tmp_path, n_parts=2, rows=50)
    alter_rename_column(d, "v", "price")
    alter_add_column(d, "channel", "String", default="web")
    alter_drop_column(d, "junk")
    out = str(tmp_path / "out")
    # predicate on the NEW name; old parts must stage with metadata
    res = mutate_native_dir(spark, d, out, delete_where=[("price", "=", 3.0)])
    assert res["rewritten_parts"] == 2
    df = _read(spark, out)
    assert df.columns == ["k", "price", "channel"]
    # fresh relation per filtered count (shared-reader pushdown trap)
    assert _read(spark, out).filter("price = 3.0").count() == 0
    assert df.count() == 100 - 2 * 7  # 7 rows of v==3 per 50-row part
    # untouched-parts path: impossible predicate, parts hard-linked,
    # out_dir must still read EVOLVED (metadata copied)
    out2 = str(tmp_path / "out2")
    res2 = mutate_native_dir(spark, d, out2, delete_where=[("k", "<", 0)])
    assert res2["rewritten_parts"] == 0
    df2 = _read(spark, out2)
    assert df2.columns == ["k", "price", "channel"]
    assert df2.count() == 100


def test_alias_aware_mutation_triage(spark, tmp_path):
    # stats live under the OLD physical name; the triage must prove a
    # predicate on the NEW name against them, or every part rewrites
    d = _mkdir(tmp_path, n_parts=2, rows=50)
    alter_rename_column(d, "v", "price")
    out = str(tmp_path / "out")
    res = mutate_native_dir(
        spark, d, out, delete_where=[("price", ">", 100.0)]
    )
    assert res["rewritten_parts"] == 0 and res["untouched_parts"] == 2
    assert _read(spark, out).count() == 100
