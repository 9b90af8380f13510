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


def test_stream_native_sink_roundtrip(spark, tmp_path):
    """writeStream -> foreachBatch native writer -> read back through
    the DataSource: row count and value sum equal the batch parquet,
    and each micro-batch produced its own batch directory."""
    import glob
    import os

    from pyspark.sql import functions as F

    from duckdb_extension_clickhouse_native_spark.streaming.events_stream import (
        read_events_stream,
        write_stream_native,
    )

    sf = "/root/testdata/sf0.001"
    events = read_events_stream(spark, sf)
    out = str(tmp_path / "native_out")
    q = write_stream_native(
        events.select("event_id", "user_id", "event_type", "value"),
        out,
        str(tmp_path / "ckpt"),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    batches = sorted(glob.glob(os.path.join(out, "batch-*")))
    assert batches, "no batch directories written"
    back = spark.read.format("clickhouse_native").load(
        os.path.join(out, "batch-*")
    )
    ref = spark.read.parquet(f"{sf}/events.parquet")
    assert back.count() == ref.count()
    got = back.agg(F.sum(F.col("value").cast("decimal(18,4)"))).head()[0]
    want = ref.agg(F.sum(F.col("value").cast("decimal(18,4)"))).head()[0]
    assert got == want
    # replaying a batch id must overwrite, not duplicate (idempotency)
    sub = spark.read.format("clickhouse_native").load(batches[0])
    n0 = sub.count()
    from duckdb_extension_clickhouse_native_spark.plans.base import load_tables  # noqa: F401

    first_batch_df = sub  # rewrite the same rows under the same id
    first_batch_df.write.format("clickhouse_native").mode("overwrite").save(batches[0])
    assert spark.read.format("clickhouse_native").load(batches[0]).count() == n0
