"""set(N) skip index: writer sidecar contents, pruning semantics, the
never-misprune property, and end-to-end planned-partition counts."""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pytest
from hypothesis import given, settings, strategies as st

from duckdb_extension_clickhouse_native_spark.native.setindex import (
    SET_MAX_DISTINCT,
    set_excludes_conjunction,
    set_excludes_filter,
    value_satisfies,
)
from duckdb_extension_clickhouse_native_spark.native.writer import (
    stats_sidecar_path,
    write_native_file,
)

from pyspark.sql.datasource import (
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    LessThan,
    LessThanOrEqual,
    StringContains,
    StringEndsWith,
    StringStartsWith,
)


def _write(tmp_path, table, **kw):
    p = os.path.join(tmp_path, "part.clickhouse")
    write_native_file(p, table, **kw)
    return json.load(open(stats_sidecar_path(p)))


def test_sidecar_stores_sorted_distinct_values(tmp_path):
    t = pa.table(
        {
            "g": pa.array([34, 2, 18, 2, 18], pa.int64()),
            "s": ["b", "a", "a", "c", "b"],
        }
    )
    side = _write(str(tmp_path), t, index_set=["g", "s"])
    assert side["set"] == {"g": [2, 18, 34], "s": ["a", "b", "c"]}


def test_cap_drops_index_not_correctness(tmp_path):
    t = pa.table({"g": pa.array(range(SET_MAX_DISTINCT + 1), pa.int64())})
    side = _write(str(tmp_path), t, index_set=["g"])
    assert "set" not in side  # over the cap: dropped, never truncated


def test_unsupported_type_drops_index(tmp_path):
    t = pa.table({"f": pa.array([1.5, 2.5], pa.float64())})
    side = _write(str(tmp_path), t, index_set=["f"])
    assert "set" not in side


def test_nulls_are_not_stored(tmp_path):
    t = pa.table({"g": pa.array([1, None, 3], pa.int64())})
    side = _write(str(tmp_path), t, index_set=["g"])
    assert side["set"]["g"] == [1, 3]


def test_single_filter_shapes():
    vals = [2, 18, 34]
    assert set_excludes_filter(vals, EqualTo(("g",), 17))
    assert not set_excludes_filter(vals, EqualTo(("g",), 18))
    assert set_excludes_filter(vals, In(("g",), (5, 6)))
    assert not set_excludes_filter(vals, In(("g",), (5, 34)))
    assert set_excludes_filter(vals, GreaterThan(("g",), 34))
    assert not set_excludes_filter(vals, GreaterThan(("g",), 33))
    assert set_excludes_filter(vals, LessThan(("g",), 2))
    assert not set_excludes_filter(vals, LessThanOrEqual(("g",), 2))
    strs = ["apple", "banana"]
    assert set_excludes_filter(strs, StringStartsWith(("s",), "c"))
    assert not set_excludes_filter(strs, StringStartsWith(("s",), "b"))
    assert set_excludes_filter(strs, StringEndsWith(("s",), "x"))
    assert set_excludes_filter(strs, StringContains(("s",), "pq"))
    assert not set_excludes_filter(strs, StringContains(("s",), "nan"))


def test_conjunction_prunes_noncontiguous_between():
    vals = [2, 18, 34]
    fs = [GreaterThanOrEqual(("g",), 14), LessThanOrEqual(("g",), 16)]
    # each filter alone is satisfiable (18 >= 14; 2 <= 16) ...
    assert not set_excludes_filter(vals, fs[0])
    assert not set_excludes_filter(vals, fs[1])
    # ... only the conjunction disproves the BETWEEN
    assert set_excludes_conjunction(vals, fs)
    # and a range that does hold a value keeps the file
    assert not set_excludes_conjunction(
        vals, [GreaterThanOrEqual(("g",), 17), LessThanOrEqual(("g",), 19)]
    )


def test_kind_mismatch_never_prunes():
    assert not set_excludes_filter([1, 2], EqualTo(("g",), "1"))
    assert not set_excludes_filter(["a"], GreaterThan(("g",), 5))
    assert value_satisfies(1, EqualTo(("g",), True)) is None
    assert not set_excludes_filter([1, 2], In(("g",), (True,)))
    assert not set_excludes_filter([], EqualTo(("g",), 1))
    assert not set_excludes_filter("corrupt", EqualTo(("g",), 1))


_FILTER_STRATEGY = st.one_of(
    st.builds(lambda v: EqualTo(("g",), v), st.integers(-5, 60)),
    st.builds(
        lambda vs: In(("g",), tuple(vs)),
        st.lists(st.integers(-5, 60), min_size=1, max_size=4),
    ),
    st.builds(lambda v: GreaterThan(("g",), v), st.integers(-5, 60)),
    st.builds(lambda v: GreaterThanOrEqual(("g",), v), st.integers(-5, 60)),
    st.builds(lambda v: LessThan(("g",), v), st.integers(-5, 60)),
    st.builds(lambda v: LessThanOrEqual(("g",), v), st.integers(-5, 60)),
)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(0, 55), min_size=1, max_size=30),
    st.lists(_FILTER_STRATEGY, min_size=1, max_size=3),
)
def test_never_misprunes(rows, filters):
    """Soundness: if the conjunction check excludes, NO row satisfies
    every filter (the exact guarantee file pruning relies on)."""
    vals = sorted(set(rows))

    def sat(x, f):
        if isinstance(f, EqualTo):
            return x == f.value
        if isinstance(f, In):
            return x in f.value
        if isinstance(f, GreaterThan):
            return x > f.value
        if isinstance(f, GreaterThanOrEqual):
            return x >= f.value
        if isinstance(f, LessThan):
            return x < f.value
        return x <= f.value

    if set_excludes_conjunction(vals, filters):
        assert not any(
            all(sat(x, f) for f in filters) for x in rows
        )
    for f in filters:
        if set_excludes_filter(vals, f):
            assert not any(sat(x, f) for x in rows)


def test_end_to_end_partition_pruning(spark, tmp_path):
    import pyarrow as pa

    for b in range(8):
        t = pa.table(
            {
                "g": pa.array([b, b + 16, b + 32], pa.int64()),
                "x": pa.array([1, 2, 3], pa.int64()),
            }
        )
        write_native_file(
            os.path.join(str(tmp_path), f"part-{b}.clickhouse"),
            t,
            index_set=["g"],
        )
    from duckdb_extension_clickhouse_native_spark.sources.native_datasource import (
        infer_native_schema,
    )

    df = (
        spark.read.format("clickhouse_native")
        .schema(infer_native_schema({"path": str(tmp_path)}))
        .load(str(tmp_path))
    )
    probe = df.filter((df.g >= 14) & (df.g <= 16))
    assert probe.rdd.getNumPartitions() == 1  # only part b=0 holds 16
    assert [r.g for r in probe.collect()] == [16]
    # equality probe through the same index
    eq = df.filter(df.g == 33)
    assert eq.rdd.getNumPartitions() == 1
    assert [r.g for r in eq.collect()] == [33]
    # a filter matching nothing keeps one token partition, zero rows
    none = df.filter((df.g >= 60) & (df.g <= 70))
    assert none.rdd.getNumPartitions() == 1
    assert none.count() == 0
