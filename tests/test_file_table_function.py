"""file() table function (r14): local files through the shared wire
decoders, ClickHouse path spelling ({N..M}/{a,b} braces + */?
wildcards), one partition per matched file — the filesystem twin of
url() (docs: sql-reference/table-functions/file)."""

from __future__ import annotations

import io
import os

import pyarrow as pa
import pytest

from duckdb_extension_clickhouse_native_spark.sources.file_table import (
    expand_file_paths,
    file_table,
)


def _write_native(path, ks, vs):
    from duckdb_extension_clickhouse_native_spark.native.codec import write_block
    from duckdb_extension_clickhouse_native_spark.native.types import parse_type

    rb = pa.RecordBatch.from_arrays(
        [pa.array(ks, type=pa.int64()), pa.array(vs)], names=["k", "v"]
    )
    buf = io.BytesIO()
    write_block(buf, rb, [parse_type("Int64"), parse_type("String")])
    with open(path, "wb") as f:
        f.write(buf.getvalue())


def test_expand_file_paths(tmp_path):
    for i in (1, 2, 3):
        (tmp_path / f"p{i}.csv").write_text("x")
    base = str(tmp_path)
    assert expand_file_paths(f"{base}/p{{1..2}}.csv") == [
        f"{base}/p1.csv", f"{base}/p2.csv",
    ]
    assert expand_file_paths(f"{base}/p*.csv") == [
        f"{base}/p1.csv", f"{base}/p2.csv", f"{base}/p3.csv",
    ]
    assert expand_file_paths(f"{base}/p1.csv,{base}/p3.csv") == [
        f"{base}/p1.csv", f"{base}/p3.csv",
    ]
    with pytest.raises(FileNotFoundError, match="no such file"):
        expand_file_paths(f"{base}/missing.csv")
    assert expand_file_paths(f"{base}/nothing*.csv") == []


def test_file_table_native_glob(spark, tmp_path):
    _write_native(tmp_path / "a1.native", [1, 2], ["x", "y"])
    _write_native(tmp_path / "a2.native", [3], ["z"])
    df = file_table(spark, f"{tmp_path}/a{{1..2}}.native", "Native")
    assert df.rdd.getNumPartitions() == 2
    assert sorted(map(tuple, df.collect())) == [(1, "x"), (2, "y"), (3, "z")]


def test_file_table_headerless_structure(spark, tmp_path):
    (tmp_path / "h.csv").write_bytes(b'1,"a"\n2,"b"\n')
    df = file_table(
        spark, f"{tmp_path}/h.csv", "CSV", structure="k Int64, v String"
    )
    assert sorted(map(tuple, df.collect())) == [(1, "a"), (2, "b")]
    with pytest.raises(Exception, match="not self-describing"):
        file_table(spark, f"{tmp_path}/h.csv", "CSV").collect()


def test_file_sql_udtf(spark, tmp_path):
    _write_native(tmp_path / "u.native", [5, 6], ["p", "q"])
    rows = spark.sql(
        f"SELECT k, v FROM clickhouse_file('{tmp_path}/u.native', 'Native') "
        "ORDER BY k"
    ).collect()
    assert [tuple(r) for r in rows] == [(5, "p"), (6, "q")]


def test_file_swapped_column_order_realigns(spark, tmp_path):
    from duckdb_extension_clickhouse_native_spark.native.codec import write_block
    from duckdb_extension_clickhouse_native_spark.native.types import parse_type

    _write_native(tmp_path / "o1.native", [1], ["x"])
    rb = pa.RecordBatch.from_arrays(
        [pa.array(["y"]), pa.array([2], type=pa.int64())], names=["v", "k"]
    )
    buf = io.BytesIO()
    write_block(buf, rb, [parse_type("String"), parse_type("Int64")])
    (tmp_path / "o2.native").write_bytes(buf.getvalue())
    df = file_table(spark, f"{tmp_path}/o{{1..2}}.native", "Native")
    assert sorted(map(tuple, df.collect())) == [(1, "x"), (2, "y")]


def test_file_scan_entry_matches_oracle(spark):
    import duckdb

    import __spark_entry__ as e

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM '{sf}/lineitem.parquet'"
    )
    name = "tf_file_scan"
    srows = sorted(map(tuple, e.queries()[name](spark, sf).collect()))
    orows = sorted(map(tuple, con.execute(e.oracle_sql()[name]).fetchall()))
    assert srows == orows and len(srows) >= 1


# --- archive reading (r15): file('archive :: member') ---------------


@pytest.fixture()
def archives(tmp_path):
    import gzip
    import io
    import tarfile
    import zipfile

    from duckdb_extension_clickhouse_native_spark.native.contentcodec import (
        compress_bytes,
    )

    with zipfile.ZipFile(tmp_path / "data.zip", "w") as zf:
        zf.writestr("part1.csv", "k,v\n1,10\n")
        zf.writestr("sub/part2.csv", "k,v\n2,20\n")
        zf.writestr("gz/part3.csv.gz", gzip.compress(b"k,v\n3,30\n"))
    with tarfile.open(tmp_path / "data.tar.gz", "w:gz") as tf:
        for name, body in [("a.csv", b"k,v\n4,40\n"), ("b.csv", b"k,v\n5,50\n")]:
            info = tarfile.TarInfo(name)
            info.size = len(body)
            tf.addfile(info, io.BytesIO(body))
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        body = b"k,v\n6,60\n"
        info = tarfile.TarInfo("z.csv")
        info.size = len(body)
        tf.addfile(info, io.BytesIO(body))
    (tmp_path / "data.tar.zst").write_bytes(
        compress_bytes(buf.getvalue(), "zstd")
    )
    (tmp_path / "x.7z").write_bytes(b"7z\xbc\xaf")
    return tmp_path


def test_archive_zip_member_glob(spark, archives):
    from duckdb_extension_clickhouse_native_spark.sources.file_table import (
        expand_file_paths,
        file_table,
    )

    # '*' must not cross '/' — top-level members only
    got = expand_file_paths(f"{archives}/data.zip :: *.csv")
    assert [p.split("::")[1] for p in got] == ["part1.csv"]
    got2 = expand_file_paths(f"{archives}/data.zip :: */part2.csv")
    assert [p.split("::")[1] for p in got2] == ["sub/part2.csv"]

    df = file_table(
        spark, f"{archives}/data.zip :: *.csv,{archives}/data.zip :: "
        "sub/part2.csv", "CSVWithNames", virtual_columns=True,
    )
    rows = sorted((r["k"], r["_file"]) for r in df.collect())
    assert rows == [(1, "part1.csv"), (2, "part2.csv")]
    assert df.rdd.getNumPartitions() == 2


def test_archive_member_compression_composes(spark, archives):
    """A .csv.gz member inside a zip decompresses twice, correctly."""
    from duckdb_extension_clickhouse_native_spark.sources.file_table import (
        file_table,
    )

    df = file_table(
        spark, f"{archives}/data.zip :: gz/part3.csv.gz", "CSVWithNames"
    )
    assert [tuple(r) for r in df.collect()] == [(3, 30)]


def test_archive_tar_variants(spark, archives):
    from duckdb_extension_clickhouse_native_spark.sources.file_table import (
        file_table,
    )

    df = file_table(spark, f"{archives}/data.tar.gz :: ?.csv", "CSVWithNames")
    assert sorted(tuple(r) for r in df.collect()) == [(4, 40), (5, 50)]
    # zstd tar rides the contentcodec wrapper (streaming mode)
    df2 = file_table(spark, f"{archives}/data.tar.zst :: z.csv", "CSVWithNames")
    assert [tuple(r) for r in df2.collect()] == [(6, 60)]


def test_archive_refusals(archives):
    from duckdb_extension_clickhouse_native_spark.sources.file_table import (
        expand_file_paths,
    )

    with pytest.raises(FileNotFoundError, match="no member"):
        expand_file_paths(f"{archives}/data.zip :: nope.csv")
    with pytest.raises(ValueError, match="7z"):
        expand_file_paths(f"{archives}/x.7z :: a.csv")
    with pytest.raises(ValueError, match="member"):
        expand_file_paths(f"{archives}/data.zip ::")
    (archives / "notarchive.txt").write_bytes(b"plain")
    with pytest.raises(ValueError, match="archive"):
        expand_file_paths(f"{archives}/notarchive.txt :: a.csv")


def test_file_insert_partitioned(spark, tmp_path):
    """INSERT INTO FUNCTION file(...) — the local-path spelling of the
    s3() write half."""
    import os

    from duckdb_extension_clickhouse_native_spark.sources.file_table import (
        file_insert,
        file_table,
    )

    df = spark.createDataFrame([(1, "A"), (2, "B")], "k bigint, grp string")
    n = file_insert(
        df, f"{tmp_path}/out_{{_partition_id}}.csv.gz", partition_by="grp"
    )
    assert n == 2
    assert sorted(os.listdir(tmp_path)) == ["out_A.csv.gz", "out_B.csv.gz"]
    back = file_table(spark, f"{tmp_path}/out_*.csv.gz")
    assert sorted(tuple(r) for r in back.collect()) == [(1, "A"), (2, "B")]
    with pytest.raises(ValueError, match="local path"):
        file_insert(df, "s3://bucket/x.csv")
