"""Structured Streaming over the clickhouse_native source: new files
and in-place appended blocks arrive as micro-batches."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from conftest import SF_SMALL
from duckdb_extension_clickhouse_native_spark.native.writer import (
    arrow_to_native_bytes,
    write_native_file,
)


def _start(spark, src_dir, name):
    stream = (
        spark.readStream.format("clickhouse_native")
        .load(src_dir)
        .groupBy("n_nationkey")
        .count()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(processingTime="0 seconds")
        .start()
    )
    return q


def test_stream_picks_up_new_files_and_appended_blocks(spark, tmp_path):
    t = pq.read_table(f"{SF_SMALL}/nation.parquet")
    src = str(tmp_path / "stream_src")
    os.makedirs(src)
    write_native_file(os.path.join(src, "a.clickhouse"), t.slice(0, 10))

    q = _start(spark, src, "native_stream_t1")
    try:
        q.processAllAvailable()
        n1 = spark.sql("SELECT count(*) FROM native_stream_t1").collect()[0][0]
        assert n1 == 10  # 10 distinct nationkeys, one group each

        # new file appears
        write_native_file(os.path.join(src, "b.clickhouse"), t.slice(10, 5))
        q.processAllAvailable()
        n2 = spark.sql("SELECT count(*) FROM native_stream_t1").collect()[0][0]
        assert n2 == 15

        # existing file grows by one appended block
        more = arrow_to_native_bytes(t.slice(15, 5))
        with open(os.path.join(src, "a.clickhouse"), "ab") as f:
            f.write(more)
        q.processAllAvailable()
        n3 = spark.sql("SELECT count(*) FROM native_stream_t1").collect()[0][0]
        assert n3 == 20
    finally:
        q.stop()


def test_stream_compressed_file_as_atomic_unit(spark, tmp_path):
    # a compressed file is not block-indexable: it must arrive as one
    # whole-file micro-batch unit alongside plain files
    t = pq.read_table(f"{SF_SMALL}/nation.parquet")
    src = str(tmp_path / "stream_comp")
    os.makedirs(src)
    write_native_file(os.path.join(src, "a.clickhouse"), t.slice(0, 10))
    write_native_file(
        os.path.join(src, "b.clickhouse"), t.slice(10, 8), compression="lz4"
    )
    q = _start(spark, src, "native_stream_t3")
    try:
        q.processAllAvailable()
        n = spark.sql("SELECT count(*) FROM native_stream_t3").collect()[0][0]
        assert n == 18
    finally:
        q.stop()


def test_stream_ignores_truncated_tail_block(spark, tmp_path):
    t = pq.read_table(f"{SF_SMALL}/nation.parquet")
    src = str(tmp_path / "stream_trunc")
    os.makedirs(src)
    write_native_file(os.path.join(src, "a.clickhouse"), t.slice(0, 10))
    # append half a block — a writer still mid-write
    blob = arrow_to_native_bytes(t.slice(10, 10))
    with open(os.path.join(src, "a.clickhouse"), "ab") as f:
        f.write(blob[: len(blob) // 2])

    q = _start(spark, src, "native_stream_t2")
    try:
        q.processAllAvailable()
        n = spark.sql("SELECT count(*) FROM native_stream_t2").collect()[0][0]
        assert n == 10  # only the complete block counted

        # writer finishes the block
        with open(os.path.join(src, "a.clickhouse"), "ab") as f:
            f.write(blob[len(blob) // 2 :])
        q.processAllAvailable()
        n = spark.sql("SELECT count(*) FROM native_stream_t2").collect()[0][0]
        assert n == 20
    finally:
        q.stop()
