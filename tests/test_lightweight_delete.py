"""Lightweight deletes: mask mechanics, reader integration, and the
cross-cutting interplay every other maintenance path must honor —
a dropped mask silently RESURRECTS deleted rows, so these tests pin
mutations, TTL, compaction, attach/detach, projections and the
trivial-count path against masked directories."""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pytest

from duckdb_extension_clickhouse_native_spark.native.delmask import (
    delmask_path,
    load_delmask,
    mask_bits,
    write_delmask,
)
from duckdb_extension_clickhouse_native_spark.native.writer import (
    stats_sidecar_path,
    write_native_file,
)
from duckdb_extension_clickhouse_native_spark.operators.mutations import (
    attach_parts,
    detach_parts,
    lightweight_delete,
    mutate_native_dir,
)
from duckdb_extension_clickhouse_native_spark.sources.native_datasource import (
    compact_native_dir,
    infer_native_schema,
)
from duckdb_extension_clickhouse_native_spark.sources.table_functions import (
    trivial_count,
)


def _mkdir(tmp_path, n_parts=4, rows=100, block_rows=30):
    d = str(tmp_path / "tbl")
    os.makedirs(d, exist_ok=True)
    for i in range(n_parts):
        t = pa.table(
            {
                "k": pa.array(
                    range(i * rows, i * rows + rows), pa.int64()
                ),
                "v": pa.array([x % 10 for x in range(rows)], pa.int64()),
            }
        )
        write_native_file(
            os.path.join(d, f"part-{i}.clickhouse"), t, block_rows=block_rows
        )
    return d


def _read(spark, d, **opts):
    r = spark.read.format("clickhouse_native").schema(
        infer_native_schema({"path": d, **opts})
    )
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load(d)


# -- mask file mechanics ------------------------------------------------------


def test_write_and_merge_masks(tmp_path):
    p = str(tmp_path / "x.clickhouse")
    write_native_file(p, pa.table({"k": pa.array(range(10), pa.int64())}))
    s1 = write_delmask(p, [1, 3], 10)
    assert s1 == {"rows": 10, "deleted": 2}
    s2 = write_delmask(p, [3, 7], 10)  # OR-merge, idempotent overlap
    assert s2 == {"rows": 10, "deleted": 3}
    m = load_delmask(p)
    keep = mask_bits(m, 0, 10)
    assert list(keep) == [
        True, False, True, False, True, True, True, False, True, True,
    ]


def test_mask_row_mismatch_refuses(tmp_path):
    p = str(tmp_path / "x.clickhouse")
    write_native_file(p, pa.table({"k": pa.array(range(10), pa.int64())}))
    write_delmask(p, [1], 10)
    with pytest.raises(ValueError, match="misalign"):
        write_delmask(p, [1], 12)
    with pytest.raises(ValueError, match="out of range"):
        write_delmask(p, [99], 10)


def test_corrupt_mask_raises(tmp_path):
    p = str(tmp_path / "x.clickhouse")
    write_native_file(p, pa.table({"k": pa.array(range(4), pa.int64())}))
    with open(delmask_path(p), "w") as f:
        f.write("{not json")
    with pytest.raises(ValueError, match="corrupt"):
        load_delmask(p)


def test_mask_bits_pads_beyond_mask_rows(tmp_path):
    # rows appended after the mask was written must be KEPT
    p = str(tmp_path / "x.clickhouse")
    write_native_file(p, pa.table({"k": pa.array(range(8), pa.int64())}))
    write_delmask(p, [0], 8)
    m = load_delmask(p)
    keep = mask_bits(m, 0, 12)
    assert len(keep) == 12 and not keep[0] and all(keep[1:])


# -- reader integration -------------------------------------------------------


def test_delete_and_read(spark, tmp_path):
    d = _mkdir(tmp_path)
    res = lightweight_delete(spark, d, [("v", "=", 3)])
    assert res["parts_masked"] == 4 and res["rows_deleted"] == 40
    df = _read(spark, d)
    assert df.count() == 360
    assert df.filter(df.v == 3).count() == 0
    # compose: second delete ORs into the same masks
    res2 = lightweight_delete(spark, d, [("v", "=", 7)])
    assert res2["rows_deleted"] == 40
    assert _read(spark, d).count() == 320
    # re-run is a no-op (masked rows never re-match)
    res3 = lightweight_delete(spark, d, [("v", "=", 7)])
    assert res3["rows_deleted"] == 0 and res3["parts_masked"] == 0
    # data files untouched: sidecar physical rows unchanged
    for fn in os.listdir(d):
        if fn.endswith(".clickhouse"):
            side = json.load(open(stats_sidecar_path(os.path.join(d, fn))))
            assert side["rows"] == 100


def test_row_index_stays_physical(spark, tmp_path):
    d = _mkdir(tmp_path, n_parts=1)
    lightweight_delete(spark, d, [("v", "=", 3)])
    df = _read(spark, d, row_index_column="_ri")
    got = {r.k: r["_ri"] for r in df.filter(df.k < 10).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 4: 4, 5: 5, 6: 6, 7: 7, 8: 8, 9: 9}


def test_split_blocks_respects_mask(spark, tmp_path):
    d = _mkdir(tmp_path, n_parts=2, rows=120, block_rows=25)
    lightweight_delete(spark, d, [("v", "=", 1)])
    df = (
        spark.read.format("clickhouse_native")
        .schema(infer_native_schema({"path": d}))
        .option("split_blocks", "true")
        .option("target_partition_bytes", "1")
        .load(d)
    )
    assert df.rdd.getNumPartitions() > 2  # actually split
    assert df.count() == 240 - 24
    assert df.filter(df.v == 1).count() == 0


def test_trivial_count_subtracts_masks(spark, tmp_path):
    d = _mkdir(tmp_path)
    lightweight_delete(spark, d, [("v", "<", 2)])
    assert trivial_count(spark, d).collect()[0][0] == 400 - 80
    # fallback when a sidecar is missing: still correct, via real scan
    os.remove(
        stats_sidecar_path(os.path.join(d, "part-0.clickhouse"))
    )
    assert trivial_count(spark, d).collect()[0][0] == 320


# -- maintenance interplay ----------------------------------------------------


def test_mutation_carries_masks_on_untouched_parts(spark, tmp_path):
    d = _mkdir(tmp_path)
    lightweight_delete(spark, d, [("v", "=", 3)])
    out = str(tmp_path / "out")
    # k < 0 matches nothing: every part is provably untouched and
    # hard-linked — the masks MUST travel or deletions resurrect
    res = mutate_native_dir(
        spark, d, out, delete_where=[("k", "<", 0)]
    )
    assert res["rewritten_parts"] == 0 and res["untouched_parts"] == 4
    assert _read(spark, out).count() == 360
    # touched parts instead MATERIALIZE the mask in their rewrite
    out2 = str(tmp_path / "out2")
    res2 = mutate_native_dir(
        spark, d, out2, delete_where=[("k", "<", 50)]
    )
    assert res2["rewritten_parts"] >= 1
    df2 = _read(spark, out2)
    assert df2.count() == 360 - 45  # 50 k-rows minus the 5 already masked
    assert df2.filter(df2.v == 3).count() == 0
    # rewritten parts carry no mask of their own
    for fn in os.listdir(out2):
        if fn.endswith(".clickhouse") and not fn.startswith("keep-"):
            assert load_delmask(os.path.join(out2, fn)) is None


def test_compaction_materializes_masks(spark, tmp_path):
    d = _mkdir(tmp_path)
    lightweight_delete(spark, d, [("v", "=", 9)])
    dst = str(tmp_path / "compacted")
    n = compact_native_dir(spark, d, dst, target_files=2)
    assert n == 360
    assert _read(spark, dst).count() == 360
    assert not any(
        fn.endswith(".delmask.json") for fn in os.listdir(dst)
    )


def test_detach_attach_carries_masks(spark, tmp_path):
    d = _mkdir(tmp_path)
    lightweight_delete(spark, d, [("v", "=", 0)])
    detach_parts(d, ["part-0.clickhouse"])
    assert _read(spark, d).count() == 270  # 3 parts x 90
    attach_parts(d)  # re-attach from detached/
    assert _read(spark, d).count() == 360  # mask came back with it


def test_projection_goes_stale_on_delete(spark, tmp_path):
    from duckdb_extension_clickhouse_native_spark.operators.projections import (
        add_projection,
        query_projection_aware,
        refresh_projection,
    )

    d = _mkdir(tmp_path)
    add_projection(
        spark, d, "by_v", group_by=["v"], aggs={"n": ("count", None)}
    )
    df, used = query_projection_aware(
        spark, d, group_by=["v"], aggs={"n": ("count", None)}
    )
    assert used == "by_v"
    before = {r.v: r.n for r in df.collect()}
    assert before[3] == 40
    lightweight_delete(spark, d, [("v", "=", 3)])
    # stale now: the mask changed content without touching part files
    df2, used2 = query_projection_aware(
        spark, d, group_by=["v"], aggs={"n": ("count", None)}
    )
    assert used2 is None  # refused the stale projection
    refresh_projection(spark, d, "by_v")
    df3, used3 = query_projection_aware(
        spark, d, group_by=["v"], aggs={"n": ("count", None)}
    )
    assert used3 == "by_v"
    got = {r.v: r.n for r in df3.collect()}
    assert 3 not in got or got.get(3, 0) == 0


def test_streaming_applies_masks_and_guards_offsets(spark, tmp_path):
    """Whole-file streaming micro-batches apply delete masks (the
    stream reader delegates to the batch read path); a mid-file
    resume offset with an armed mask REFUSES instead of misaligning
    physical rows."""
    import pyarrow as pa

    d = str(tmp_path / "stream")
    os.makedirs(d)
    t = pa.table(
        {
            "k": pa.array(range(50), pa.int64()),
            "v": pa.array([x % 5 for x in range(50)], pa.int64()),
        }
    )
    write_native_file(os.path.join(d, "part-0.clickhouse"), t, block_rows=10)
    lightweight_delete(spark, d, [("v", "=", 2)])
    from duckdb_extension_clickhouse_native_spark.sources.native_datasource import (
        infer_native_schema,
    )

    sdf = (
        spark.readStream.format("clickhouse_native")
        .schema(infer_native_schema({"path": d}))
        .load(d)
    )
    q = (
        sdf.writeStream.format("memory")
        .queryName("lwdel_stream")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql("SELECT count(*) AS n FROM lwdel_stream").collect()
        assert got[0].n == 40  # 10 masked rows dropped mid-stream
    finally:
        q.stop()
    # mid-file partition with unknown physical start row + mask: loud
    from duckdb_extension_clickhouse_native_spark.sources.native_datasource import (
        ClickHouseNativeReader,
        NativeFilePartition,
    )

    reader = ClickHouseNativeReader(
        infer_native_schema({"path": d}), {"path": d}
    )
    part = NativeFilePartition(
        os.path.join(d, "part-0.clickhouse"), start_offset=100, n_blocks=2
    )
    with pytest.raises(ValueError, match="start row is unknown"):
        list(reader.read(part))
