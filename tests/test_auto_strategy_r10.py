"""strategy="auto" promotion (r9 verdict #5): the default
``dedup_substring_spans`` and ``events_max_intersections`` entries now
pick between the fast single-window form and the skew-immune two-phase
form from a cheap data estimate.  Pinned here:

* all three strategies produce identical rows on random corpora
  (hypothesis) and on hand-built hostile fixtures;
* the auto decision actually flips past the crossover (thresholds
  monkeypatched down so the flip happens at test scale);
* the decision is cached per dataset.
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from conftest import SF_SMALL


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


# -- substring spans ----------------------------------------------------------

def test_span_auto_equals_both_fixed_forms(spark):
    from duckdb_extension_clickhouse_native_spark.operators.dedup import (
        substring_spans_query,
    )

    auto = _rows(substring_spans_query(spark, SF_SMALL, strategy="auto"))
    win = _rows(substring_spans_query(spark, SF_SMALL, strategy="window"))
    two = _rows(substring_spans_query(spark, SF_SMALL, strategy="twophase"))
    assert auto == win == two


def test_span_auto_picks_window_on_benign_corpus(spark):
    from duckdb_extension_clickhouse_native_spark.operators import dedup

    dedup._SPAN_AUTO_DECISIONS.clear()
    substring = dedup.substring_spans_query(spark, SF_SMALL, strategy="auto")
    substring.count()
    assert dedup._SPAN_AUTO_DECISIONS[(SF_SMALL, 8)] == "window"


def test_span_auto_flips_to_twophase_past_crossover(spark, tmp_path, monkeypatch):
    from duckdb_extension_clickhouse_native_spark.operators import dedup

    para = " ".join(f"h{i}" for i in range(10))
    texts = [f"unique{i} {para} {para}" for i in range(80)]
    d = str(tmp_path / "docs")
    spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    ).write.parquet(d + "/documents.parquet")
    # the hot gram occurs ~240x (3 windows x 80 docs); drop the
    # crossover below that so auto must choose the two-phase form
    monkeypatch.setattr(dedup, "SPAN_HOT_GRAM_CROSSOVER", 100)
    dedup._SPAN_AUTO_DECISIONS.clear()
    auto = _rows(dedup.substring_spans_query(spark, d, strategy="auto"))
    assert dedup._SPAN_AUTO_DECISIONS[(d, 8)] == "twophase"
    assert auto == _rows(dedup.substring_spans_query(spark, d, strategy="window"))
    dedup._SPAN_AUTO_DECISIONS.clear()


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "dup", "x1", "x2"]),
            min_size=0,
            max_size=24,
        ),
        min_size=1,
        max_size=16,
    )
)
def test_span_strategies_agree_on_random_corpora(spark, tmp_path_factory, docs):
    from duckdb_extension_clickhouse_native_spark.operators.dedup import (
        substring_spans_query,
    )

    d = str(tmp_path_factory.mktemp("rand"))
    texts = [" ".join(toks) for toks in docs]
    spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    ).write.parquet(d + "/documents.parquet")
    win = _rows(substring_spans_query(spark, d, w=3, strategy="window"))
    two = _rows(substring_spans_query(spark, d, w=3, strategy="twophase"))
    assert win == two


# -- max intersections --------------------------------------------------------

def _write_events(tmp_path, rows):
    d = str(tmp_path / "ev")
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    import pyspark.sql

    spark = pyspark.sql.SparkSession.getActiveSession()
    spark.createDataFrame(pdf).write.parquet(d + "/events.parquet")
    return d


def test_maxint_auto_equals_both_fixed_forms(spark):
    from duckdb_extension_clickhouse_native_spark.plans import timeseries

    auto = _rows(timeseries._max_intersections_query(spark, SF_SMALL, "auto"))
    win = _rows(timeseries._max_intersections_query(spark, SF_SMALL, "window"))
    two = _rows(timeseries._max_intersections_query(spark, SF_SMALL, "twophase"))
    assert auto == win == two


def test_maxint_auto_decision_and_flip(spark, tmp_path, monkeypatch):
    from duckdb_extension_clickhouse_native_spark.plans import timeseries

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(seconds=i % 7), i % 3, "t" + str(i % 2), 1.50, "{}")
        for i in range(40)
    ]
    d = _write_events(tmp_path, rows)
    timeseries._MAXINT_AUTO_DECISIONS.clear()
    win = _rows(timeseries._max_intersections_query(spark, d, "auto"))
    assert timeseries._MAXINT_AUTO_DECISIONS[d] == "window"  # 40 pts/key
    # drop the crossover to force the flip; results must not change
    monkeypatch.setattr(timeseries, "MAXINT_POINTS_PER_KEY_CROSSOVER", 10)
    timeseries._MAXINT_AUTO_DECISIONS.clear()
    two = _rows(timeseries._max_intersections_query(spark, d, "auto"))
    assert timeseries._MAXINT_AUTO_DECISIONS[d] == "twophase"
    assert win == two
    timeseries._MAXINT_AUTO_DECISIONS.clear()


def test_maxint_bad_strategy_raises(spark):
    from duckdb_extension_clickhouse_native_spark.plans import timeseries

    with pytest.raises(ValueError, match="unknown strategy"):
        timeseries._max_intersections_query(spark, SF_SMALL, "bogus")
