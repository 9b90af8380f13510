"""generateRandom(structure, seed) — deterministic distributed
generator (r14): one 31-bit LCG stream per column over spark.range,
same expression tree rendered for Spark and the DuckDB oracle."""

from __future__ import annotations

import pytest

from duckdb_extension_clickhouse_native_spark.sources.generate_random import (
    generate_random_table,
    genrand_oracle_source,
)


def test_deterministic_across_calls(spark):
    a = generate_random_table(spark, "x UInt32, s String", 500, seed=7)
    b = generate_random_table(spark, "x UInt32, s String", 500, seed=7)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_seed_changes_stream(spark):
    a = generate_random_table(spark, "x UInt32", 100, seed=1).collect()
    b = generate_random_table(spark, "x UInt32", 100, seed=2).collect()
    assert [r.x for r in a] != [r.x for r in b]


def test_type_ranges(spark):
    df = generate_random_table(
        spark,
        "u8 UInt8, i8 Int8, f Float64, flag Bool, d Date, "
        "tags Array(UInt16), maybe Nullable(Int64)",
        2000,
        seed=3,
    )
    rows = df.collect()
    assert all(0 <= r.u8 <= 255 for r in rows)
    assert all(-128 <= r.i8 <= 127 for r in rows)
    assert all(0.0 <= r.f < 1.0 for r in rows)
    assert {r.flag for r in rows} == {True, False}
    lens = {len(r.tags) for r in rows}
    assert lens == {0, 1, 2, 3}  # sequence(1,0)=[1,0] trap: 0 must occur
    nulls = sum(1 for r in rows if r.maybe is None)
    assert 0 < nulls < len(rows)  # ~1/11 null rate


def test_matches_duckdb_regeneration(spark):
    import duckdb

    structure = "x UInt32, s String, tags Array(UInt16)"
    sdf = generate_random_table(spark, structure, 3000, seed=11)
    srows = sorted(map(tuple, sdf.collect()))
    src = genrand_oracle_source(structure, 3000, 11)
    orows = sorted(
        tuple(list(r)[:2] + [list(r[2])]) if False else tuple(r)
        for r in duckdb.connect().execute(f"SELECT * FROM {src}").fetchall()
    )
    # arrays come back as python lists from both engines
    assert [tuple([a, b, list(c)]) for a, b, c in srows] == [
        tuple([a, b, list(c)]) for a, b, c in orows
    ]


def test_unsupported_type_named_error(spark):
    with pytest.raises(Exception, match="generateRandom"):
        generate_random_table(spark, "m Map(String, UInt64)", 10).collect()
