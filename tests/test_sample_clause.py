"""ClickHouse SAMPLE clause over the native source.

Contract: deterministic two-round Lehmer hash on the sampling key,
uniform (octile skew measured in writer.py), NESTED (SAMPLE 0.2 at the
same offset is a superset of SAMPLE 0.1 — ClickHouse's consistency
guarantee), offsets partition the table exactly, and the hash-range
lowering prunes BLOCK RANGES via the ordinary min/max sidecar (planned
block-partition count asserted, the bloom-index precedent).
"""

from __future__ import annotations

import os
import shutil

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from duckdb_extension_clickhouse_native_spark.native.writer import (
    SAMPLE_HASH_COLUMN,
    SAMPLE_HASH_M,
    sample_hash_sql,
    write_native_file,
)

SRC = "/root/testdata/sf0.001/orders.parquet"


@pytest.fixture(scope="module")
def sample_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("sample_by"))
    t = pq.read_table(SRC)
    n = t.num_rows
    write_native_file(
        os.path.join(d, "part1.clickhouse"),
        t.slice(0, n // 2),
        sample_by="o_orderkey",
        block_rows=100,
    )
    write_native_file(
        os.path.join(d, "part2.clickhouse"),
        t.slice(n // 2),
        sample_by="o_orderkey",
        block_rows=100,
    )
    return d


def _sample_df(spark, d, frac, off="0", **extra):
    r = (
        spark.read.format("clickhouse_native")
        .option("sample", frac)
        .option("sample_offset", off)
    )
    for k, v in extra.items():
        r = r.option(k, v)
    return r.load(d)


def test_sample_matches_sql_hash_oracle(spark, sample_dir):
    got = sorted(
        r["o_orderkey"]
        for r in _sample_df(spark, sample_dir, "0.125", "0.25")
        .select("o_orderkey")
        .collect()
    )
    lo, hi = int(0.25 * SAMPLE_HASH_M), int(0.375 * SAMPLE_HASH_M)
    hs = sample_hash_sql("o_orderkey")
    want = [
        r[0]
        for r in duckdb.sql(
            f"SELECT o_orderkey FROM '{SRC}' "
            f"WHERE {hs} >= {lo} AND {hs} < {hi} ORDER BY o_orderkey"
        ).fetchall()
    ]
    assert got == want and len(got) > 0


def test_sample_nested_and_partitioning(spark, sample_dir):
    k1 = {
        r["o_orderkey"]
        for r in _sample_df(spark, sample_dir, "0.1").collect()
    }
    k2 = {
        r["o_orderkey"]
        for r in _sample_df(spark, sample_dir, "0.2").collect()
    }
    assert k1 <= k2  # nested-sample guarantee
    # SAMPLE 0.5 + SAMPLE 0.5 OFFSET 0.5 partition the table exactly
    a = {
        r["o_orderkey"]
        for r in _sample_df(spark, sample_dir, "0.5").collect()
    }
    b = {
        r["o_orderkey"]
        for r in _sample_df(spark, sample_dir, "0.5", "0.5").collect()
    }
    full = {
        r["o_orderkey"]
        for r in spark.read.format("clickhouse_native")
        .load(sample_dir)
        .collect()
    }
    assert a | b == full and not (a & b)


def test_sample_prunes_block_ranges(spark, sample_dir):
    base = (
        spark.read.format("clickhouse_native")
        .option("split_blocks", "true")
        .option("target_partition_bytes", "8192")
    )
    full_parts = base.load(sample_dir).rdd.getNumPartitions()
    sampled = (
        base.option("sample", "0.125").load(sample_dir)
    )
    samp_parts = sampled.rdd.getNumPartitions()
    # 1/8 hash range over hash-sorted blocks: most block ranges prune
    assert samp_parts <= max(2, full_parts // 4), (
        full_parts,
        samp_parts,
    )


def test_sample_option_refusals(spark, sample_dir, tmp_path):
    # fraction/offset validation
    with pytest.raises(Exception, match="sample"):
        _sample_df(spark, sample_dir, "0").collect()
    with pytest.raises(Exception, match="sample"):
        _sample_df(spark, sample_dir, "0.5", "0.6").collect()
    # a table without sample_by has no _sample_hash
    plain = str(tmp_path / "plain")
    os.makedirs(plain)
    write_native_file(
        os.path.join(plain, "p.clickhouse"), pq.read_table(SRC)
    )
    with pytest.raises(Exception, match="sample_by"):
        _sample_df(spark, plain, "0.5").collect()


def test_writer_sample_by_refusals(tmp_path):
    t = pa.table({"k": [1, None, 3], "v": ["a", "b", "c"]})
    with pytest.raises(ValueError, match="null"):
        write_native_file(str(tmp_path / "x"), t, sample_by="k")
    t2 = pa.table({"k": ["a"], "v": [1]})
    with pytest.raises(ValueError, match="integer"):
        write_native_file(str(tmp_path / "y"), t2, sample_by="k")
    with pytest.raises(ValueError, match="not in table"):
        write_native_file(str(tmp_path / "z"), t2, sample_by="nope")


def test_sample_hash_column_is_sorted_and_queryable(spark, sample_dir):
    df = spark.read.format("clickhouse_native").load(sample_dir)
    assert SAMPLE_HASH_COLUMN in df.columns
    rows = (
        df.select(SAMPLE_HASH_COLUMN)
        .limit(50)
        .collect()
    )
    vals = [r[SAMPLE_HASH_COLUMN] for r in rows]
    assert all(0 <= v < SAMPLE_HASH_M for v in vals)


def test_sink_sample_by_roundtrip(spark, tmp_path):
    """Spark-written tables (the DSv2 sink) support sample_by too —
    including under partition_by (the global hash sort survives the
    per-combo fan-out, so every partition file stays hash-sorted)."""
    out = str(tmp_path / "sink_sample")
    src = spark.read.parquet(SRC)
    (
        src.repartition(2)
        .write.format("clickhouse_native")
        .option("sample_by", "o_orderkey")
        .option("partition_by", "o_orderstatus")
        .mode("overwrite")
        .save(out)
    )
    got = sorted(
        r["o_orderkey"]
        for r in _sample_df(spark, out, "0.125", "0.25")
        .select("o_orderkey")
        .collect()
    )
    lo, hi = int(0.25 * SAMPLE_HASH_M), int(0.375 * SAMPLE_HASH_M)
    hs = sample_hash_sql("o_orderkey")
    want = [
        r[0]
        for r in duckdb.sql(
            f"SELECT o_orderkey FROM '{SRC}' "
            f"WHERE {hs} >= {lo} AND {hs} < {hi} ORDER BY o_orderkey"
        ).fetchall()
    ]
    assert got == want and len(got) > 0


def test_sink_sample_by_refusals(spark, tmp_path):
    src = spark.read.parquet(SRC)
    with pytest.raises(Exception, match="mutually exclusive"):
        (
            src.write.format("clickhouse_native")
            .option("sample_by", "o_orderkey")
            .option("sort_by", "o_orderdate")
            .mode("overwrite")
            .save(str(tmp_path / "x"))
        )
    with pytest.raises(Exception, match="not in schema"):
        (
            src.write.format("clickhouse_native")
            .option("sample_by", "nope")
            .mode("overwrite")
            .save(str(tmp_path / "y"))
        )


def test_stream_sample_matches_batch(spark, sample_dir):
    """readStream + sample: the stream reader wraps the batch reader,
    so the lowered hash-range filters apply per micro-batch — the
    drained stream equals the batch SAMPLE exactly."""
    schema = (
        spark.read.format("clickhouse_native").load(sample_dir).schema
    )
    q = (
        spark.readStream.format("clickhouse_native")
        .schema(schema)
        .option("sample", "0.25")
        .load(sample_dir)
        .writeStream.format("memory")
        .queryName("sample_stream_pin")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        r["o_orderkey"]
        for r in spark.sql(
            "SELECT o_orderkey FROM sample_stream_pin"
        ).collect()
    }
    want = {
        r["o_orderkey"]
        for r in _sample_df(spark, sample_dir, "0.25").collect()
    }
    assert got == want and got
