"""Differential SQL fuzzing (fixed seeds, so the suite is
deterministic): random queries from the parity-safe grammar run as
the SAME text on Spark and DuckDB and must hash-match. Complements
the hand-written conformance corpus with shapes nobody thought to
write. A failing seed reproduces standalone via
``python tools/sql_fuzz.py 1 <seed>``."""

from __future__ import annotations

from oracle_harness import duckdb_connection

from tools.sql_fuzz import gen_query, run_fuzz

SF = "/root/testdata/sf0.001"


def test_fuzz_batch_is_clean(spark):
    con = duckdb_connection(SF)
    failures = run_fuzz(spark, con, 30, 1_000, SF)
    assert failures == [], failures[:2]


def test_generator_is_deterministic_and_diverse():
    qs = [gen_query(s) for s in range(200, 260)]
    assert qs == [gen_query(s) for s in range(200, 260)]
    # shape diversity in a 60-seed window
    assert any(" JOIN " in q for q in qs)
    assert any(" GROUP BY " in q for q in qs)
    assert any("DISTINCT" in q for q in qs)
    assert any("ROW_NUMBER()" in q for q in qs)
    assert any((" UNION " in q) or (" INTERSECT " in q) or (" EXCEPT " in q) for q in qs)
