"""text_ngram_distance posting-list plan (r11 twin, r13 default): the
formulation must agree ROW-FOR-ROW with the gram-array form — both are
registered against the same DuckDB oracle, so twin-SQL parity blindness
is the failure mode this pin guards (a shared wrong assumption in both
SQL texts would still hash-match the driver; random hostile corpora +
a hand fixture break the symmetry)."""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from duckdb_extension_clickhouse_native_spark.plans.advanced import (
    _NGRAM_DIST_FAST_SPARK,
    _NGRAM_DIST_SPARK,
    _NGRAM_NEEDLE,
    ngram_distance_fast_df,
)


def _run_both(spark, texts):
    spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    ).createOrReplaceTempView("documents")
    slow = [tuple(r) for r in spark.sql(_NGRAM_DIST_SPARK).collect()]
    fast = [tuple(r) for r in spark.sql(_NGRAM_DIST_FAST_SPARK).collect()]
    # the r15 map-only mapInArrow kernel — the form registered under
    # the family name since the optimization round — must agree too
    arrow = [tuple(r) for r in ngram_distance_fast_df(spark).collect()]
    assert arrow == slow
    return slow, fast


# alphabet engineered for gram collisions with the needle AND internal
# duplicates (repeated fragments exercise the distinct logic)
_FRAGS = st.sampled_from(
    [
        "machine",
        "learning",
        "pipeline",
        " ",
        "mach",
        "chin",
        "pipe",
        "line",
        "xyz",
        "aaaa",
        "ab",
        _NGRAM_NEEDLE,
    ]
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(st.lists(st.lists(_FRAGS, min_size=0, max_size=12), min_size=1, max_size=25))
def test_fast_twin_matches_gram_array_form(spark, docs):
    texts = ["".join(frags) for frags in docs]
    slow, fast = _run_both(spark, texts)
    assert slow == fast


def test_fast_twin_hostile_fixture(spark):
    texts = [
        "",  # filtered (len < 4)
        "mac",  # filtered
        "mach",  # exactly one gram
        "aaaaaaaa",  # one distinct gram from 5 positions
        _NGRAM_NEEDLE,  # sim == 1.0
        _NGRAM_NEEDLE * 3,  # duplicated needle: same distinct set
        "MACHINE LEARNING PIPELINE",  # case-folded to sim == 1.0
        "the quick brown fox jumps over the lazy dog",
        "machine but not the rest",
        "pipeline pipeline pipeline",
    ]
    slow, fast = _run_both(spark, texts)
    assert slow == fast
    by_id = {r[0]: r for r in fast}
    # exact-needle docs: full similarity; the x3 concatenation adds
    # junction grams ('inem', ...) so its union grows past the needle's
    assert by_id[4][3] == 1.0 and by_id[6][3] == 1.0
    assert 0.8 < by_id[5][3] < 1.0
    # single-gram doc: 1 common gram ('mach'), union = 1 + 22 - 1
    assert by_id[2][1] == 1 and by_id[2][2] == 22
    # 'aaaaaaaa': one distinct gram, zero common
    assert by_id[3][1] == 0 and by_id[3][2] == 23
    # filtered docs never appear
    assert 0 not in by_id and 1 not in by_id
