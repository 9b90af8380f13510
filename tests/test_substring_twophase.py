"""The two substring-span plans must be row-identical on any corpus —
including one with the boilerplate skew the two-phase form exists for.
"""

from __future__ import annotations

import pandas as pd

from conftest import SF_SMALL


def _rows(df):
    return [tuple(r) for r in df.collect()]


def test_twophase_equals_window_on_fixture(spark):
    from duckdb_extension_clickhouse_native_spark.plans.base import REGISTRY
    from duckdb_extension_clickhouse_native_spark.plans import pipeline  # noqa: F401

    a = REGISTRY.all()["dedup_substring_spans"].build(spark, SF_SMALL)
    b = REGISTRY.all()["dedup_substring_spans_twophase"].build(spark, SF_SMALL)
    assert _rows(a) == _rows(b)


def test_twophase_equals_window_on_boilerplate(spark, tmp_path):
    from duckdb_extension_clickhouse_native_spark.plans.base import REGISTRY
    from duckdb_extension_clickhouse_native_spark.plans import pipeline  # noqa: F401

    para = " ".join(f"b{i}" for i in range(12))
    texts = [f"unique{i} words here {para} {para} tail{i}" for i in range(200)]
    texts += ["short doc", ""]  # sub-w docs exercise the empty-gram arm
    d = str(tmp_path / "docs")
    spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    ).write.parquet(d + "/documents.parquet")
    a = REGISTRY.all()["dedup_substring_spans"].build(spark, d)
    b = REGISTRY.all()["dedup_substring_spans_twophase"].build(spark, d)
    rows = _rows(a)
    assert rows == _rows(b)
    assert rows  # the boilerplate must actually produce spans
