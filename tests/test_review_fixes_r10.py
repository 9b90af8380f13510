"""Round-10 in-session review findings.

THE SHARED-RELATION PUSHDOWN TRAP: branch-filtering a single
Python-DataSource DataFrame into a union (or self-join) loses one
branch's pushed filter — pyspark keeps one reader per DataSource
relation, so the second branch's pushFilters pass overwrites the
first's and BOTH scans execute with the last-pushed filters (AQE
on/off makes no difference). Found while building apply_ttl
(kept∪rolled silently became expired∪rolled). The engine-level contract, asserted here: SEPARATE
``load()`` calls per branch are always correct; every operator in
this package follows it (apply_ttl fixed; audit of the other
python-DS call sites found each one already single-branch or
fresh-load-per-branch).
"""

from __future__ import annotations

import datetime
import os

import pyarrow as pa

from duckdb_extension_clickhouse_native_spark.native.writer import write_native_file
from duckdb_extension_clickhouse_native_spark.operators.mutations import apply_ttl


def _ts_dir(d: str, n_parts: int = 4, per: int = 50) -> int:
    """Parts with an INT epoch column t: part i holds t in
    [i*per, (i+1)*per) — int stats make sidecar TTL pruning provable."""
    for i in range(n_parts):
        lo = i * per
        t = pa.table(
            {
                "t": pa.array(range(lo, lo + per), type=pa.int64()),
                "g": pa.array([f"g{j % 2}" for j in range(per)]),
                "v": pa.array([j + 1 for j in range(per)], type=pa.int64()),
            }
        )
        write_native_file(os.path.join(d, f"part-{i:03d}.clickhouse"), t)
    return n_parts * per


def _load(spark, d):
    return spark.read.format("clickhouse_native").load(d)


def test_separate_loads_keep_distinct_pushed_filters(spark, tmp_path):
    """The safe pattern: one load() per branch — the union sees both
    filters."""
    d = str(tmp_path / "t")
    os.makedirs(d)
    n = _ts_dir(d)
    lo = _load(spark, d).filter("t < 100")
    hi = _load(spark, d).filter("t >= 100")
    assert lo.unionAll(hi).count() == n
    # and a self-anti-overlap join over separate loads stays empty
    a = _load(spark, d).filter("t < 100").select("t")
    b = _load(spark, d).filter("t >= 100").selectExpr("t AS t2")
    assert a.join(b, a.t == b.t2, "inner").count() == 0


def test_shared_relation_branch_pushdown_trap_documented(spark, tmp_path):
    """Pin the TRAP's existence so a pyspark upgrade that gives each
    pushdown pass its own reader is noticed (then the fresh-load
    workaround can be retired). If this starts returning count == n,
    celebrate and update operators/mutations.py's comment."""
    d = str(tmp_path / "t")
    os.makedirs(d)
    n = _ts_dir(d)
    df = _load(spark, d)
    u = df.filter("t < 100").unionAll(df.filter("t >= 100"))
    got = u.count()
    assert got in (n, 2 * (n - 100)), got
    if got != n:
        # both branches collapsed onto the second branch's scan
        assert got == 2 * (n - 100)


def test_ttl_delete_reuses_expired_free_parts(spark, tmp_path):
    src, out = str(tmp_path / "src"), str(tmp_path / "out")
    os.makedirs(src)
    _ts_dir(src)  # t in [0,200), 4 parts of 50
    st = apply_ttl(spark, src, out, ttl_where=[("t", "<", 50)])
    # parts 1-3 provably hold no t<50 -> linked untouched
    assert st["untouched_parts"] == 3 and st["rewritten_parts"] == 1
    got = sorted(r.t for r in _load(spark, out).collect())
    assert got == list(range(50, 200))


def test_ttl_group_by_rollup_preserves_totals(spark, tmp_path):
    src, out = str(tmp_path / "src"), str(tmp_path / "out")
    os.makedirs(src)
    _ts_dir(src)
    st = apply_ttl(
        spark,
        src,
        out,
        ttl_where=[("t", "<", 100)],
        group_by=["g"],
        set_exprs={"v": "SUM(v)", "t": "MAX(t)"},
    )
    # parts 2-3 (t >= 100) provably untouched
    assert st["untouched_parts"] == 2 and st["rewritten_parts"] == 2
    rows = _load(spark, out).collect()
    # 100 kept rows + 2 rollup rows (g0, g1)
    assert len(rows) == 102
    # v totals preserved exactly: sum over source [1..50]x4 parts
    assert sum(r.v for r in rows) == 4 * sum(range(1, 51))
    rolled = sorted((r.g, r.t, r.v) for r in rows if r.t < 100)
    # expired: parts 0-1, v=j+1 per part; per g: 2 parts x 25 values
    exp_g0 = 2 * sum(j + 1 for j in range(50) if j % 2 == 0)
    exp_g1 = 2 * sum(j + 1 for j in range(50) if j % 2 == 1)
    assert rolled == [("g0", 98, exp_g0), ("g1", 99, exp_g1)]


def test_ttl_rollup_default_min_for_unset_columns(spark, tmp_path):
    src, out = str(tmp_path / "src"), str(tmp_path / "out")
    os.makedirs(src)
    _ts_dir(src, n_parts=1, per=10)  # t in [0,10)
    apply_ttl(
        spark,
        src,
        out,
        ttl_where=[("t", "<", 10)],
        group_by=["g"],
        set_exprs={"v": "SUM(v)"},
    )
    rows = sorted((r.g, r.t, r.v) for r in _load(spark, out).collect())
    # t not SET -> deterministic MIN default per group
    assert rows == [
        ("g0", 0, sum(j + 1 for j in range(10) if j % 2 == 0)),
        ("g1", 1, sum(j + 1 for j in range(10) if j % 2 == 1)),
    ]


def test_ttl_timestamp_predicates_never_prune_but_stay_correct(
    spark, tmp_path
):
    """Timestamp columns carry no sidecar stats: every part is
    conservatively touched, results exact."""
    src, out = str(tmp_path / "src"), str(tmp_path / "out")
    os.makedirs(src)
    base = datetime.datetime(2024, 1, 1)
    t = pa.table(
        {
            "ts": pa.array(
                [base + datetime.timedelta(days=i) for i in range(10)],
                type=pa.timestamp("us"),
            ),
            "g": pa.array(["a"] * 10),
            "v": pa.array(range(10), type=pa.int64()),
        }
    )
    write_native_file(os.path.join(src, "p0.clickhouse"), t)
    st = apply_ttl(
        spark,
        src,
        out,
        ttl_where=[("ts", "<", base + datetime.timedelta(days=5))],
        group_by=["g"],
        set_exprs={"v": "SUM(v)", "ts": "MAX(ts)"},
    )
    assert st["untouched_parts"] == 0
    rows = sorted(
        (r.ts, r.v) for r in _load(spark, out).collect()
    )
    assert rows[0] == (base + datetime.timedelta(days=4), 0 + 1 + 2 + 3 + 4)
    assert [v for _ts, v in rows[1:]] == [5, 6, 7, 8, 9]


def test_sql_insert_into_view_contract(spark, tmp_path):
    """INSERT INTO appends through a USING view are visible; after
    INSERT OVERWRITE the view must be re-created (pyspark caches the
    python-DS relation plan; REFRESH TABLE does not reach it)."""
    d = str(tmp_path / "t")
    os.makedirs(d)
    t = pa.table(
        {"k": pa.array([100], type=pa.int64()), "s": pa.array(["seed"])}
    )
    write_native_file(os.path.join(d, "seed.clickhouse"), t)

    def mk():
        spark.sql(
            "CREATE OR REPLACE TEMPORARY VIEW ins_tgt "
            f"USING clickhouse_native OPTIONS (path '{d}')"
        )

    mk()
    spark.sql(
        "INSERT INTO ins_tgt SELECT id AS k, CAST(id AS STRING) AS s "
        "FROM range(10)"
    )
    assert spark.sql("SELECT COUNT(*) AS n FROM ins_tgt").collect()[0].n == 11
    spark.sql(
        "INSERT OVERWRITE ins_tgt SELECT id AS k, 'x' AS s FROM range(3)"
    )
    mk()  # the documented invalidation
    [r] = spark.sql("SELECT COUNT(*) AS n, SUM(k) AS sk FROM ins_tgt").collect()
    assert (r.n, r.sk) == (3, 3)


def test_empty_dir_schema_error_is_clear(tmp_path):
    import pytest

    from duckdb_extension_clickhouse_native_spark.sources.native_datasource import (
        infer_native_schema,
    )

    d = str(tmp_path / "empty")
    os.makedirs(d)
    with pytest.raises(FileNotFoundError, match="seed part"):
        infer_native_schema({"path": d})
