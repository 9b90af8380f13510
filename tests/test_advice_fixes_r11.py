"""Regression tests for the round-10 ADVICE findings (fixed in r11):

1. projections.py — avg served from a projection now merges as
   sum(sum__c)/sum(cntv__c) with a stored NON-NULL count state, so the
   projection path agrees with the full-scan F.avg on nullable columns.
2. mutations.py apply_ttl — rows whose TTL predicate evaluates to NULL
   (e.g. NULL ts) survive as KEPT rows instead of silently vanishing.
3. mutations.py — out_dir == src_dir (or an ancestor) is refused up
   front in both mutate_native_dir and apply_ttl, before the
   idempotent rebuild clears the destination.
4. functions/datetime.py — %e is space-padded to width 2 (strftime
   semantics), via a computed lpad expression.
5. imagecodec.encode_gif — non-positive dimensions raise
   MediaFormatError, not a bare max()-of-empty ValueError.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pytest

from duckdb_extension_clickhouse_native_spark.native.writer import write_native_file
from duckdb_extension_clickhouse_native_spark.operators.mutations import (
    apply_ttl,
    mutate_native_dir,
)
from duckdb_extension_clickhouse_native_spark.operators.projections import (
    add_projection,
    query_projection_aware,
)


# ---- 1. projection avg on a nullable column ------------------------------


def test_projection_avg_uses_nonnull_count(spark, tmp_path):
    d = str(tmp_path / "tbl")
    os.makedirs(d)
    # g='a': values [10, NULL, 20] -> avg 15.0 (NOT 10.0 = 30/3)
    # g='b': values [NULL, 8]      -> avg 8.0  (NOT 4.0 = 8/2)
    t = pa.table(
        {
            "g": pa.array(["a", "a", "a", "b", "b"]),
            "v": pa.array([10, None, 20, None, 8], type=pa.int64()),
        }
    )
    write_native_file(os.path.join(d, "part-000.clickhouse"), t)
    aggs = {"mean_v": ("avg", "v"), "n": ("count", None)}

    # full-scan answer first (no projection yet)
    df0, used0 = query_projection_aware(spark, d, group_by=["g"], aggs=aggs)
    assert used0 is None
    base = {r.g: (r.mean_v, r.n) for r in df0.collect()}
    assert base == {"a": (15.0, 3), "b": (8.0, 2)}

    add_projection(spark, d, "by_g", group_by=["g"], aggs=aggs)
    df1, used1 = query_projection_aware(spark, d, group_by=["g"], aggs=aggs)
    assert used1 == "by_g"  # actually served from the projection
    got = {r.g: (r.mean_v, r.n) for r in df1.collect()}
    assert got == base  # both paths agree on nullable avg


def test_projection_missing_cntv_state_falls_back(spark, tmp_path):
    """A manifest lacking the non-null count state cannot serve avg —
    the query falls back to the (correct) full scan rather than
    dividing by the wrong denominator."""
    import json

    d = str(tmp_path / "tbl")
    os.makedirs(d)
    t = pa.table(
        {
            "g": pa.array(["a", "a"]),
            "v": pa.array([10, None], type=pa.int64()),
        }
    )
    write_native_file(os.path.join(d, "part-000.clickhouse"), t)
    aggs = {"mean_v": ("avg", "v")}
    add_projection(spark, d, "by_g", group_by=["g"], aggs=aggs)
    # simulate a pre-r11 manifest: drop the cntv state entry
    man_path = os.path.join(d, "_projection_by_g.json")
    man = json.load(open(man_path))
    man["states"] = [s for s in man["states"] if not s.startswith("cntv__")]
    json.dump(man, open(man_path, "w"))
    df, used = query_projection_aware(spark, d, group_by=["g"], aggs=aggs)
    assert used is None  # not coverable -> full scan
    assert {r.g: r.mean_v for r in df.collect()} == {"a": 10.0}


# ---- 2. TTL NULL-predicate rows survive ----------------------------------


def test_ttl_rollup_null_ts_rows_are_kept(spark, tmp_path):
    src, out = str(tmp_path / "src"), str(tmp_path / "out")
    os.makedirs(src)
    t = pa.table(
        {
            "g": pa.array(["x", "x", "x", "y"]),
            "t": pa.array([5, None, 50, None], type=pa.int64()),
            "v": pa.array([1, 2, 3, 4], type=pa.int64()),
        }
    )
    write_native_file(os.path.join(src, "part-000.clickhouse"), t)
    apply_ttl(
        spark,
        src,
        out,
        ttl_where=[("t", "<", 10)],
        group_by=["g"],
        set_exprs={"v": "SUM(v)"},
    )
    rows = sorted(
        ((r.g, r.t, r.v) for r in
         spark.read.format("clickhouse_native").load(out).collect()),
        key=lambda x: (x[0], x[1] is None, x[1] or 0),
    )
    # expired: only (x, 5, 1) -> rollup row (x, 5, 1); NULL-t rows and
    # t=50 keep verbatim — nothing vanishes
    assert rows == [
        ("x", 5, 1),
        ("x", 50, 3),
        ("x", None, 2),
        ("y", None, 4),
    ]


# ---- 3. out_dir == src_dir refused ---------------------------------------


def _one_part(d: str) -> None:
    os.makedirs(d, exist_ok=True)
    t = pa.table({"k": pa.array([1, 2, 3], type=pa.int64())})
    write_native_file(os.path.join(d, "part-000.clickhouse"), t)


def test_mutate_refuses_src_as_out(spark, tmp_path):
    src = str(tmp_path / "src")
    _one_part(src)
    with pytest.raises(ValueError, match="source directory"):
        mutate_native_dir(spark, src, src, delete_where=[("k", "<", 2)])
    # and via a non-canonical spelling of the same path
    with pytest.raises(ValueError, match="source directory"):
        mutate_native_dir(
            spark, src, src + os.sep + ".", delete_where=[("k", "<", 2)]
        )
    # the table survived untouched
    assert len(os.listdir(src)) >= 1


def test_ttl_refuses_src_ancestor_as_out(spark, tmp_path):
    src = str(tmp_path / "parent" / "src")
    _one_part(src)
    with pytest.raises(ValueError, match="source directory"):
        apply_ttl(
            spark,
            src,
            str(tmp_path / "parent"),
            ttl_where=[("k", "<", 2)],
            group_by=["k"],
        )
    with pytest.raises(ValueError, match="source directory"):
        apply_ttl(spark, src, src, ttl_where=[("k", "<", 2)])


# ---- 4. %e space-padded day-of-month -------------------------------------


def test_format_datetime_e_is_space_padded(spark):
    # (DuckDB strftime rejects %e outright, so no oracle twin is even
    # possible — the pin is the C strftime %e contract: space-padded
    # to width 2)
    from duckdb_extension_clickhouse_native_spark.functions.datetime import (
        format_datetime_expr,
    )

    expr = format_datetime_expr("ts", "%e|%Y-%m-%e")
    got = [
        r.s
        for r in spark.sql(
            "SELECT "
            + expr.replace("ts", "TIMESTAMP'2024-03-02 10:00:00'")
            + " AS s"
        ).collect()
    ]
    assert got == [" 2|2024-03- 2"]
    # two-digit day keeps working
    expr2 = format_datetime_expr("ts", "%e")
    got2 = spark.sql(
        "SELECT "
        + expr2.replace("ts", "TIMESTAMP'2024-03-15 10:00:00'")
        + " AS s"
    ).collect()[0].s
    assert got2 == "15"


# ---- 5. encode_gif rejects zero dimensions -------------------------------


def test_encode_gif_rejects_non_positive_dims():
    from duckdb_extension_clickhouse_native_spark.functions.imagecodec import (
        MediaFormatError,
        encode_gif,
    )

    pal = bytes([0, 0, 0, 255, 255, 255])
    with pytest.raises(MediaFormatError, match="non-positive"):
        encode_gif(b"", 0, 0, pal)
    with pytest.raises(MediaFormatError, match="non-positive"):
        encode_gif(b"", 3, 0, pal)
    with pytest.raises(MediaFormatError, match="non-positive"):
        encode_gif(b"", -1, 1, pal)
