"""Filesystem-abstraction tests: local fast path and the pyarrow-fs
URI path (driven via file:// so no object store is needed — s3://,
hdfs://, gs:// take the identical code path through
pyarrow.fs.FileSystem.from_uri)."""

from __future__ import annotations

import pyarrow as pa
import pytest

from duckdb_extension_clickhouse_native_spark.filesystem import (
    file_size,
    is_uri,
    open_input,
    resolve_paths,
)
from duckdb_extension_clickhouse_native_spark.native.writer import write_native_file


@pytest.fixture()
def native_dir(tmp_path):
    t = pa.table({"k": pa.array([1, 2, 3], pa.int64())})
    for i in range(3):
        write_native_file(str(tmp_path / f"part-{i}.clickhouse"), t)
    (tmp_path / "_SUCCESS").write_text("")
    return tmp_path


def test_local_dir_listing(native_dir):
    out = resolve_paths(str(native_dir))
    assert len(out) == 3 and all(p.endswith(".clickhouse") for p in out)


def test_local_glob(native_dir):
    out = resolve_paths(str(native_dir / "part-*.clickhouse"))
    assert len(out) == 3


def test_local_single_file(native_dir):
    p = str(native_dir / "part-0.clickhouse")
    assert resolve_paths(p) == [p]
    assert not is_uri(p)


def test_uri_dir_listing(native_dir):
    out = resolve_paths(f"file://{native_dir}")
    assert len(out) == 3
    assert all(p.startswith("file://") and p.endswith(".clickhouse") for p in out)
    # _SUCCESS is never listed
    assert not any("_SUCCESS" in p for p in out)


def test_uri_glob(native_dir):
    out = resolve_paths(f"file://{native_dir}/part-*.clickhouse")
    assert len(out) == 3 and all(p.startswith("file://") for p in out)


def test_uri_single_file_roundtrip(native_dir):
    uri = f"file://{native_dir}/part-1.clickhouse"
    assert resolve_paths(uri) == [uri]
    local = str(native_dir / "part-1.clickhouse")
    assert file_size(uri) == file_size(local)
    with open_input(uri) as ruri, open_input(local) as rloc:
        assert ruri.read() == rloc.read()
    # seekability (block-split partitions need it)
    with open_input(uri) as r:
        r.seek(4)
        assert r.tell() == 4


def test_datasource_reads_file_uri(spark, native_dir):
    df = spark.read.format("clickhouse_native").load(f"file://{native_dir}")
    assert df.count() == 9  # 3 files x 3 rows
    assert df.rdd.getNumPartitions() == 3


def test_datasource_split_blocks_over_uri(spark, native_dir):
    df = (
        spark.read.format("clickhouse_native")
        .option("split_blocks", "true")
        .load(f"file://{native_dir}/part-0.clickhouse")
    )
    assert df.count() == 3


def test_uri_glob_intermediate_wildcard(tmp_path):
    """A wildcard in an intermediate path component must descend into
    subdirectories (glob.glob semantics) on the URI path too."""
    from duckdb_extension_clickhouse_native_spark.filesystem import resolve_paths

    for sub in ("a", "b"):
        d = tmp_path / sub
        d.mkdir()
        (d / "part.native").write_bytes(b"x")
        (d / "other.txt").write_bytes(b"y")
    hits = resolve_paths(f"file://{tmp_path}/*/part.native")
    assert len(hits) == 2
    assert all(h.endswith("part.native") for h in hits)
    # '*' must not cross '/': no match for the nested layout
    deep = tmp_path / "a" / "deep"
    deep.mkdir()
    (deep / "part.native").write_bytes(b"z")
    hits2 = resolve_paths(f"file://{tmp_path}/*/part.native")
    assert len(hits2) == 2
