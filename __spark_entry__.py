"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

All queries live in ``duckdb_extension_clickhouse_native_spark.plans``
(SURVEY.md §2 coverage: §2.1 source queries in plans/sources.py, §2.2
host surface in plans/relational.py, pipeline operators in
plans/pipeline.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# importing these modules populates the registry
from duckdb_extension_clickhouse_native_spark.plans import (  # noqa: F401
    advanced,
    compat_r12,
    compat_r12b,
    compat_r12c,
    compat_r12d,
    compat_r12e,
    compat_r12f,
    compat_r13,
    pipeline,
    relational,
    sources,
    sources_r13,
    sources_r14,
    sources_r15,
    sources_r15b,
    stats,
    streaming_queries,
    timeseries,
    tpch,
)
from duckdb_extension_clickhouse_native_spark.plans.base import REGISTRY


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing summary) on sf0.001."""
    q = REGISTRY.all()["q1_pricing_summary"]
    return q.build(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return REGISTRY.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query — every registered query has a
    real oracle (approximate sketches use bounded-error booleans, float
    BLAS paths share a rounded exact oracle)."""
    return REGISTRY.oracles()
