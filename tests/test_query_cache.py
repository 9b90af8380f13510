"""Query result cache (operators/querycache.py): ClickHouse
``use_query_cache`` TTL semantics — hit within TTL never re-reads the
source, expiry recomputes, canonically-identical plans share entries,
schema drift invalidates."""

from __future__ import annotations

import pytest

from duckdb_extension_clickhouse_native_spark.operators.querycache import (
    cached_query,
    plan_cache_key,
    purge_query_cache,
    query_cache_entries,
)


@pytest.fixture()
def cache_dir(tmp_path):
    return str(tmp_path / "qcache")


def _events_agg(spark, parquet_dir):
    df = spark.read.parquet(f"{parquet_dir}/events.parquet")
    from pyspark.sql import functions as F

    return (
        df.groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .orderBy("event_type")
    )


SF = "/root/testdata/sf0.001"


def test_miss_then_hit(spark, cache_dir):
    clock = [1000.0]
    q = _events_agg(spark, SF)
    r1, hit1 = cached_query(
        spark, q, cache_dir=cache_dir, now_fn=lambda: clock[0]
    )
    assert not hit1
    rows1 = sorted(tuple(r) for r in r1.collect())
    clock[0] += 10  # inside the 60 s default TTL
    r2, hit2 = cached_query(
        spark, q, cache_dir=cache_dir, now_fn=lambda: clock[0]
    )
    assert hit2
    assert sorted(tuple(r) for r in r2.collect()) == rows1
    assert len(query_cache_entries(cache_dir)) == 1


def test_hit_ignores_source_mutation_within_ttl(spark, cache_dir, tmp_path):
    """The documented ClickHouse trade: bounded staleness — a source
    change inside the TTL window is invisible to cache hits."""
    import shutil

    src = tmp_path / "events.parquet"
    shutil.copy(f"{SF}/events.parquet", src)
    clock = [0.0]

    def q():
        df = spark.read.parquet(str(src))
        from pyspark.sql import functions as F

        return df.agg(F.count("*").alias("n"))

    r1, hit1 = cached_query(
        spark, q(), cache_dir=cache_dir, now_fn=lambda: clock[0]
    )
    n1 = r1.collect()[0].n
    assert not hit1
    # halve the source file
    half = spark.read.parquet(str(src)).limit(n1 // 2)
    half.write.mode("overwrite").parquet(str(tmp_path / "half"))
    shutil.rmtree(src, ignore_errors=True) if src.is_dir() else src.unlink()
    shutil.copytree(str(tmp_path / "half"), str(src))
    clock[0] = 30.0  # still fresh
    r2, hit2 = cached_query(
        spark, q(), cache_dir=cache_dir, now_fn=lambda: clock[0]
    )
    assert hit2 and r2.collect()[0].n == n1  # stale by design
    clock[0] = 120.0  # expired -> recompute sees the mutation
    r3, hit3 = cached_query(
        spark, q(), cache_dir=cache_dir, now_fn=lambda: clock[0]
    )
    assert not hit3 and r3.collect()[0].n == n1 // 2


def test_canonical_identity_shares_entry(spark, cache_dir):
    from pyspark.sql import functions as F

    df = spark.read.parquet(f"{SF}/events.parquet")
    a = df.filter(F.col("event_id") < 100).select("event_id")
    b = df.select("event_id").filter(df["event_id"] < 100)
    assert plan_cache_key(a) == plan_cache_key(b)
    # different output names must NOT share
    c = df.filter(F.col("event_id") < 100).select(
        F.col("event_id").alias("eid")
    )
    assert plan_cache_key(a) != plan_cache_key(c)


def test_purge(spark, cache_dir):
    q = _events_agg(spark, SF)
    cached_query(spark, q, cache_dir=cache_dir, now_fn=lambda: 0.0)
    assert purge_query_cache(cache_dir) == 1
    assert query_cache_entries(cache_dir) == []
