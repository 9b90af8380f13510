"""Unsupported-type handling: the default raises UnsupportedTypeError
(strict, stream-safe); ``unsupported_as_varchar=true`` reproduces the
reference's '<unsupported:T>' placeholder behavior (lib.rs:168-170),
which consumes no payload bytes. Plus sign-LSH bucket sizing at scale."""

from __future__ import annotations

import io

import pytest

from duckdb_extension_clickhouse_native_spark.native.codec import (
    read_block,
    write_str,
    write_varuint,
)
from duckdb_extension_clickhouse_native_spark.native.types import (
    UnsupportedTypeError,
    parse_type,
    to_arrow,
)


def _block_with_unknown_type(n_rows: int = 3) -> bytes:
    """A hand-built Native block: one Int64 column then a column of an
    unknown type with no payload (the only layout the placeholder mode
    can read without desync — unknown payloads are never consumed)."""
    buf = io.BytesIO()
    write_varuint(buf, 2)  # n_columns
    write_varuint(buf, n_rows)
    write_str(buf, "k")
    write_str(buf, "Int64")
    for i in range(n_rows):
        buf.write(i.to_bytes(8, "little", signed=True))
    write_str(buf, "mystery")
    write_str(buf, "AggregateFunction(uniq, String)")
    # no payload bytes for the unknown column
    return buf.getvalue()


def test_default_raises_on_unknown_type():
    with pytest.raises(UnsupportedTypeError):
        parse_type("AggregateFunction(uniq, String)")
    with pytest.raises(UnsupportedTypeError):
        read_block(io.BytesIO(_block_with_unknown_type()))


def test_placeholder_mode_emits_varchar():
    t = parse_type("AggregateFunction(uniq, String)", unsupported_as_varchar=True)
    assert t.base == "Unsupported"
    assert to_arrow(t).equals(__import__("pyarrow").string())
    blk = read_block(
        io.BytesIO(_block_with_unknown_type()), unsupported_as_varchar=True
    )
    d = blk.to_record_batch().to_pydict()
    assert d["k"] == [0, 1, 2]
    assert d["mystery"] == ["<unsupported:AggregateFunction(uniq, String)>"] * 3


def test_placeholder_mode_via_datasource(spark, tmp_path):
    p = tmp_path / "u.clickhouse"
    p.write_bytes(_block_with_unknown_type())
    df = (
        spark.read.format("clickhouse_native")
        .option("unsupported_as_varchar", "true")
        .load(str(p))
    )
    rows = {r["k"]: r["mystery"] for r in df.collect()}
    assert rows[1] == "<unsupported:AggregateFunction(uniq, String)>"
    # strict default: the scan fails loudly instead
    with pytest.raises(Exception):
        spark.read.format("clickhouse_native").load(str(p)).collect()


def test_signlsh_dims_scale_with_corpus():
    from duckdb_extension_clickhouse_native_spark.operators.similarity import (
        DIM,
        signlsh_dims_for,
        signlsh_pairs_sql,
    )

    # expected occupancy n / 2^dims stays at or below the target
    for n in (500, 10**6, 10**9, 10**10, 10**12):
        dims = signlsh_dims_for(n)
        assert dims <= DIM
        if 2**dims < n:  # not capped by the embedding dimensionality
            assert n / 2**dims <= 1024 or dims == DIM
    assert signlsh_dims_for(500) == 10  # conformance corpus unchanged
    assert signlsh_dims_for(10**10) == 24
    # the SQL generator accepts scaled dims (bucket expr widens)
    sql = signlsh_pairs_sql("spark", sign_dims=signlsh_dims_for(10**10))
    assert sql.count("CASE WHEN") >= 24
