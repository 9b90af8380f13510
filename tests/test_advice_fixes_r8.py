"""Regression tests for the round-8 ADVICE findings.

Each test pins the *fixed* behavior of one finding:
  1. bloomjoin `_h` parenthesization — DuckDB bucket ids were
     effectively unbounded (the appended `% 65536` bound only the
     last nibble term of the unwrapped 15-term sum), silently voiding
     the m=65536/k=4 sizing / broadcast-bitmap contract;
  2. filesystem URI-vs-local listing divergence for mixed top-level
     layouts (stray non-suffix file at the ROOT of a hive layout was
     included via file:// but excluded locally, and degraded the URI
     layout to unpartitioned);
  3. block-level pruning degrades to "never skip" on malformed
     sidecar column-stat CONTENTS (offset/rows are validated by
     _sidecar_blocks, stat values were not) instead of raising
     during planning;
  4. streaming batch-dir union raises a clear error on zero committed
     batch dirs instead of a bare reduce() TypeError;
  5. merge_upsert fabricated insert keys derive from MAX(c_custkey)
     (scalar CTE), not a hard-coded 1e6 that collides at large scale
     factors.
"""

from __future__ import annotations

import hashlib
import json
import os

import duckdb
import pyarrow as pa
import pytest
from pyspark.sql.datasource import GreaterThan, IsNull

from duckdb_extension_clickhouse_native_spark.native.writer import (
    stats_sidecar_path,
    write_native_file,
)
from duckdb_extension_clickhouse_native_spark.sources.native_datasource import (
    ClickHouseNativeReader,
    infer_native_schema,
)

SF_SMALL = "/root/testdata/sf0.001"


# ---------------------------------------------------------------- 1
def test_bloom_hash_bounded_and_engine_identical():
    """Every k-hash value must land in [0, M_BITS) on the DuckDB
    dialect (before the fix the % bound only the last nibble term),
    and must equal the reference md5-15-nibble bucket id — which is
    what the Spark conv() branch computes."""
    from duckdb_extension_clickhouse_native_spark.operators.bloomjoin import (
        M_BITS,
        _h,
    )

    con = duckdb.connect()
    for i in range(4):
        expr = _h("duckdb", "k", i)
        rows = con.execute(
            f"SELECT k, {expr} FROM range(500) t(k) ORDER BY k"
        ).fetchall()
        for k, h in rows:
            want = int(hashlib.md5(f"b{i}#{k}".encode()).hexdigest()[:15], 16) % M_BITS
            assert h == want, (i, k, h, want)
        assert all(0 <= h < M_BITS for _, h in rows)


def test_bloom_relation_word_count_bounded(spark):
    """The bloom CTE must hold at most M_BITS/32 word rows on BOTH
    dialects — the documented broadcast-bitmap contract."""
    from duckdb_extension_clickhouse_native_spark.operators.bloomjoin import (
        M_BITS,
        bloom_semijoin_sql,
    )

    for dialect in ("duckdb", "spark"):
        sql = bloom_semijoin_sql(dialect)
        prefix = sql[: sql.index("probe_keys AS")].rstrip().rstrip(",")
        count_sql = prefix + "\nSELECT COUNT(*) AS n FROM bloom"
        if dialect == "duckdb":
            con = duckdb.connect()
            con.execute(
                "CREATE TABLE customer AS SELECT range AS c_custkey, 'n' AS c_name, "
                "range % 25 AS c_nationkey, 0.0 AS c_acctbal, "
                "CASE WHEN range % 2 = 0 THEN 'AUTOMOBILE' ELSE 'MACHINERY' END "
                "AS c_mktsegment FROM range(5000)"
            )
            n = con.execute(count_sql).fetchone()[0]
        else:
            spark.range(5000).selectExpr(
                "id AS c_custkey",
                "'n' AS c_name",
                "CAST(id % 25 AS INT) AS c_nationkey",
                "CAST(0.0 AS DOUBLE) AS c_acctbal",
                "CASE WHEN id % 2 = 0 THEN 'AUTOMOBILE' ELSE 'MACHINERY' END "
                "AS c_mktsegment",
            ).createOrReplaceTempView("customer")
            n = spark.sql(count_sql).collect()[0][0]
        assert n <= M_BITS // 32, (dialect, n)


# ---------------------------------------------------------------- 2
def test_uri_listing_stray_root_file_matches_local(tmp_path):
    """A stray non-suffix file at the ROOT of a hive layout must be
    excluded by both the local and the file:// listing (extends
    test_uri_dir_listing_matches_local_per_directory)."""
    from duckdb_extension_clickhouse_native_spark.filesystem import resolve_paths

    d = tmp_path / "tbl"
    (d / "day=1").mkdir(parents=True)
    (d / "day=2").mkdir()
    (d / "day=1" / "part-0.native").write_bytes(b"x")
    (d / "day=2" / "part-0.data").write_bytes(b"x")
    (d / "readme.txt").write_text("stray")
    local = [os.path.relpath(p, d) for p in resolve_paths(str(d))]
    via_uri = [
        os.path.relpath(p.replace("file://", ""), d)
        for p in resolve_paths(f"file://{d}")
    ]
    assert local == via_uri == ["day=1/part-0.native", "day=2/part-0.data"]


def test_uri_listing_root_fallback_still_fires_when_nothing_matches(tmp_path):
    """The top-level non-underscore fallback must still apply on the
    URI branch when NO file anywhere carries a preferred suffix."""
    from duckdb_extension_clickhouse_native_spark.filesystem import resolve_paths

    d = tmp_path / "flat"
    d.mkdir()
    (d / "data.bin").write_bytes(b"x")
    (d / "_SUCCESS").write_bytes(b"")
    local = [os.path.basename(p) for p in resolve_paths(str(d))]
    via_uri = [
        os.path.basename(p) for p in resolve_paths(f"file://{d}")
    ]
    assert local == via_uri == ["data.bin"]


# ---------------------------------------------------------------- 3
def test_malformed_block_stats_degrade_to_never_skip(tmp_path):
    """Garbage per-block column-stat CONTENTS (valid offsets/rows, but
    e.g. nulls='x' probed by an IsNull filter) must keep the block
    (never-skip) instead of raising during planning."""
    d = str(tmp_path / "badstats")
    os.makedirs(d)
    p = os.path.join(d, "one.clickhouse")
    write_native_file(
        p, pa.table({"k": pa.array(range(1000), pa.int64())}), block_rows=250
    )
    side_path = stats_sidecar_path(p)
    with open(side_path) as f:
        side = json.load(f)
    assert side.get("blocks"), "writer should have emitted a block index"
    for b in side["blocks"]:
        b["columns"] = {"k": {"min": None, "max": None, "nulls": "x"}}
    with open(side_path, "w") as f:
        json.dump(side, f)

    schema = infer_native_schema({"path": d})
    reader = ClickHouseNativeReader(
        schema, {"path": d, "split_blocks": "true", "target_partition_bytes": "1"}
    )
    reader.pushed = [IsNull(("k",))]
    parts = reader.partitions()  # must not raise
    assert len(parts) == 4  # all blocks kept: malformed stats never skip

    # sane stats on the same shape still prune (the guard must not
    # have turned pruning off wholesale)
    for i, b in enumerate(side["blocks"]):
        b["columns"] = {
            "k": {"min": i * 250, "max": i * 250 + 249, "nulls": 0}
        }
    with open(side_path, "w") as f:
        json.dump(side, f)
    reader2 = ClickHouseNativeReader(
        schema, {"path": d, "split_blocks": "true", "target_partition_bytes": "1"}
    )
    reader2.pushed = [GreaterThan(("k",), 700)]
    assert len(reader2.partitions()) < 4


# ---------------------------------------------------------------- 4
def test_stream_zero_batch_dirs_clear_error(spark, tmp_path):
    """A stale _DONE marker over a sink with zero batch directories
    must raise the designed RuntimeError, not a reduce() TypeError."""
    import shutil
    import tempfile

    from duckdb_extension_clickhouse_native_spark.plans.streaming_queries import (
        _stream_partitioned_sink_agg,
    )

    fake_sf = tmp_path / "sf"
    fake_sf.mkdir()
    shutil.copy(os.path.join(SF_SMALL, "events.parquet"), fake_sf / "events.parquet")
    src = os.path.abspath(str(fake_sf / "events.parquet"))
    st = os.stat(src)
    work = os.path.join(
        tempfile.gettempdir(),
        "chsql_native_fixtures",
        hashlib.md5(src.encode()).hexdigest()[:10],
        f"stream-psink-{int(st.st_mtime)}-{st.st_size}",
    )
    os.makedirs(work, exist_ok=True)
    with open(os.path.join(work, "_DONE"), "w") as f:
        f.write("")
    try:
        with pytest.raises(RuntimeError, match="batch"):
            _stream_partitioned_sink_agg(spark, str(fake_sf))
    finally:
        shutil.rmtree(os.path.dirname(work), ignore_errors=True)


# ---------------------------------------------------------------- 5
def test_merge_upsert_insert_keys_above_max():
    """Fabricated 'inserted' keys must start strictly above
    MAX(c_custkey) — no collision with base keys at ANY scale factor —
    and the delta must contain no duplicate keys."""
    from duckdb_extension_clickhouse_native_spark.operators.dataops import (
        merge_upsert_sql,
    )

    sql = merge_upsert_sql("duckdb")
    assert "1000000" not in sql
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW customer AS SELECT * FROM "
        f"read_parquet('{SF_SMALL}/customer.parquet')"
    )
    mx = con.execute("SELECT MAX(c_custkey) FROM customer").fetchone()[0]
    rows = con.execute(sql).fetchall()
    inserted = [r for r in rows if r[-1] == "inserted"]
    assert len(inserted) == 50
    assert min(r[0] for r in inserted) == mx + 1
    # no duplicated output keys (the FULL OUTER JOIN stayed 1:1)
    keys = [r[0] for r in rows]
    assert len(keys) == len(set(keys))


# ---------------------------------------------------------------- 6
def test_one_listing_per_plan_flat_layout(tmp_path, spark, monkeypatch):
    """partitions() must reuse the __init__ listing snapshot for flat
    layouts — one directory walk per reader (per plan), not one per
    partitions() call (stretch item: object-store LIST economy)."""
    import pyarrow as pa

    from duckdb_extension_clickhouse_native_spark.native.writer import (
        write_native_file,
    )
    from duckdb_extension_clickhouse_native_spark.sources import (
        native_datasource as nd,
    )

    d = str(tmp_path / "flat")
    os.makedirs(d)
    for i in range(3):
        write_native_file(
            os.path.join(d, f"p{i}.clickhouse"),
            pa.table({"v": pa.array(range(10), pa.int64())}),
        )
    schema = nd.infer_native_schema({"path": d})

    calls = {"n": 0}
    real = nd._resolve_paths

    def counting(path):
        calls["n"] += 1
        return real(path)

    monkeypatch.setattr(nd, "_resolve_paths", counting)
    reader = nd.ClickHouseNativeReader(schema, {"path": d})
    assert calls["n"] == 1  # the __init__ walk
    p1 = reader.partitions()
    p2 = reader.partitions()
    assert calls["n"] == 1  # both partitions() calls reused the snapshot
    assert len(p1) == len(p2) == 3


# ---------------------------------------------------------------- 7
def test_mixed_width_files_read_under_widest_schema(spark, tmp_path):
    """Schema widening across files: a directory mixing Int32 and
    Int64 files for the same column reads correctly under the declared
    BIGINT schema (the per-block align step casts narrow blocks up).
    Pins a capability the align code provides implicitly."""
    import pyarrow as pa

    from duckdb_extension_clickhouse_native_spark.native.types import parse_type

    d = str(tmp_path / "widen")
    os.makedirs(d)
    write_native_file(
        os.path.join(d, "a_narrow.clickhouse"),
        pa.table({"v": pa.array([1, 2, 3], pa.int32())}),
        ch_types=[parse_type("Int32")],
    )
    write_native_file(
        os.path.join(d, "b_wide.clickhouse"),
        pa.table({"v": pa.array([2**40, 5], pa.int64())}),
        ch_types=[parse_type("Int64")],
    )
    df = (
        spark.read.format("clickhouse_native")
        .schema("v bigint")
        .load(d)
    )
    assert sorted(r.v for r in df.collect()) == [1, 2, 3, 5, 2**40]


# ---------------------------------------------------------------- 8
def test_asof_nearest_strategies_agree(spark):
    """The nearest direction must produce IDENTICAL results on the
    broadcast and bucket strategies, including exact-distance ties
    (backward wins) and tolerance misses (NULL match)."""
    left = spark.createDataFrame(
        [
            (1, 10, "2024-01-01 10:00:00"),   # tie: purchases at +-1h
            (2, 10, "2024-01-01 23:00:00"),   # only later within tol
            (3, 11, "2024-01-01 05:00:00"),   # nothing within tol
            (4, 12, "2024-01-01 08:30:00"),   # closer forward
        ],
        "event_id long, user_id long, ts string",
    ).selectExpr("event_id", "user_id", "CAST(ts AS TIMESTAMP) AS ts")
    right = spark.createDataFrame(
        [
            (10, "2024-01-01 09:00:00", 1.0),  # backward tie candidate
            (10, "2024-01-01 11:00:00", 2.0),  # forward tie candidate
            (10, "2024-01-02 00:30:00", 3.0),
            (11, "2024-01-02 05:00:00", 4.0),  # 24h away -> miss
            (12, "2024-01-01 06:00:00", 5.0),
            (12, "2024-01-01 09:00:00", 6.0),  # closer (30min vs 2.5h)
        ],
        "user_id long, rts string, v double",
    ).selectExpr("user_id", "CAST(rts AS TIMESTAMP) AS rts", "v")

    from duckdb_extension_clickhouse_native_spark.operators.asof import asof_join

    kw = dict(
        key="user_id",
        left_ts="ts",
        right_ts="rts",
        out_schema=(
            "event_id bigint, user_id bigint, ts timestamp, "
            "rts timestamp, v double"
        ),
        value_cols=["v"],
        direction="nearest",
        tolerance_us=2 * 3600 * 1_000_000,
    )
    rows_b = sorted(
        tuple(r) for r in asof_join(left, right, strategy="broadcast", **kw).collect()
    )
    rows_k = sorted(
        tuple(r) for r in asof_join(left, right, strategy="bucket", **kw).collect()
    )
    assert rows_b == rows_k
    by_id = {r[0]: r for r in rows_b}
    assert by_id[1][4] == 1.0      # tie -> backward candidate
    assert by_id[2][4] == 3.0      # only the later purchase in range
    assert by_id[3][3] is None and by_id[3][4] is None  # tolerance miss
    assert by_id[4][4] == 6.0      # closer forward row wins
