"""url() glob expansion (r14, VERDICT r13 item 4): ClickHouse's
``{N..M}`` numeric ranges (zero-padded ``{01..12}``), ``{a,b}``
alternation, cartesian products, the 1000-element expansion cap, and
brace-aware top-level comma splitting — matching docs:
sql-reference/table-functions/url 'Globs in URL'."""

from __future__ import annotations

import pytest

from duckdb_extension_clickhouse_native_spark.sources.url_table import (
    expand_url_globs,
    expand_urls,
)


def test_numeric_range():
    assert expand_url_globs("http://h/part{1..4}.csv") == [
        f"http://h/part{i}.csv" for i in (1, 2, 3, 4)
    ]


def test_numeric_range_zero_padded():
    out = expand_url_globs("http://h/m{01..12}.csv")
    assert out[0] == "http://h/m01.csv"
    assert out[8] == "http://h/m09.csv"
    assert out[-1] == "http://h/m12.csv"
    assert len(out) == 12


def test_alternation():
    assert expand_url_globs("http://h/{a,b,c}.csv") == [
        "http://h/a.csv", "http://h/b.csv", "http://h/c.csv",
    ]


def test_cartesian_product():
    out = expand_url_globs("http://h/{x,y}/p{1..2}.csv")
    assert out == [
        "http://h/x/p1.csv", "http://h/x/p2.csv",
        "http://h/y/p1.csv", "http://h/y/p2.csv",
    ]


def test_no_glob_passthrough():
    assert expand_url_globs("http://h/a.csv") == ["http://h/a.csv"]


def test_unbalanced_braces():
    with pytest.raises(ValueError, match="unbalanced"):
        expand_url_globs("http://h/p{1..4.csv")
    with pytest.raises(ValueError, match="unbalanced"):
        expand_url_globs("http://h/p1..4}.csv")


def test_descending_and_empty_refused():
    with pytest.raises(ValueError, match="descending"):
        expand_url_globs("http://h/p{4..1}.csv")
    with pytest.raises(ValueError, match="empty group"):
        expand_url_globs("http://h/p{}.csv")


def test_expansion_cap():
    # ClickHouse glob_expansion_max_elements = 1000
    assert len(expand_url_globs("http://h/p{1..1000}")) == 1000
    with pytest.raises(ValueError, match="1000"):
        expand_url_globs("http://h/p{1..1001}")


def test_top_level_comma_split_is_brace_aware():
    # the comma inside {a,b} is glob syntax, NOT a URL separator
    assert expand_urls("http://h/{a,b}.csv,http://g/x.csv") == [
        "http://h/a.csv", "http://h/b.csv", "http://g/x.csv",
    ]


def test_expand_urls_strips_and_skips_empty():
    assert expand_urls(" http://h/a , ,http://h/b ") == [
        "http://h/a", "http://h/b",
    ]


def test_glob_scan_entry_matches_oracle(spark):
    """tf_url_glob_scan vs its DuckDB oracle at sf0.001 — the same
    comparison the driver runs at sf0.01."""
    import duckdb

    import __spark_entry__ as e

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM '{sf}/orders.parquet'")
    name = "tf_url_glob_scan"
    sdf = e.queries()[name](spark, sf)
    srows = sorted(map(tuple, sdf.collect()))
    orows = sorted(map(tuple, con.execute(e.oracle_sql()[name]).fetchall()))
    assert srows == orows
    assert len(srows) >= 1
