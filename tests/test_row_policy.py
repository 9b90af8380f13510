"""CREATE ROW POLICY: permissive OR-combination, deny-by-default once
any policy exists, TO ALL policies, CREATE OR REPLACE / DROP
lifecycle, and predicate pushdown (the policy filter must reach the
scan like any user filter).
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

from duckdb_extension_clickhouse_native_spark.native.writer import (
    write_native_file,
)
from duckdb_extension_clickhouse_native_spark.operators.rowpolicy import (
    apply_row_policies,
    create_row_policy,
    drop_row_policy,
    list_row_policies,
    policy_predicate,
)

SRC = "/root/testdata/sf0.001/events.parquet"


@pytest.fixture(scope="module")
def table_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("policied"))
    write_native_file(
        os.path.join(d, "p.clickhouse"), pq.read_table(SRC)
    )
    return d


def _df(spark, d):
    return spark.read.format("clickhouse_native").load(d)


def test_no_policies_is_unrestricted(spark, table_dir):
    assert policy_predicate(table_dir, "anyone") is None
    n = apply_row_policies(_df(spark, table_dir), table_dir, "anyone").count()
    assert n == _df(spark, table_dir).count()


def test_policy_semantics(spark, table_dir):
    create_row_policy(
        table_dir, "analyst_types",
        "event_type IN ('click', 'view')", to_users=["analyst"],
    )
    create_row_policy(
        table_dir, "auditor_value", "value >= 100.0", to_users=["auditor"]
    )
    df = _df(spark, table_dir)
    full = df.count()
    # deny-by-default: a user named by NO policy sees zero rows
    assert apply_row_policies(df, table_dir, "stranger").count() == 0
    # each user sees exactly their predicate's rows
    analyst = apply_row_policies(df, table_dir, "analyst")
    assert (
        analyst.count()
        == df.filter("event_type IN ('click', 'view')").count()
        < full
    )
    auditor = apply_row_policies(df, table_dir, "auditor")
    assert auditor.count() == df.filter("value >= 100.0").count()
    # TO ALL policy OR-combines for named users AND covers strangers
    create_row_policy(
        table_dir, "signups_public", "event_type = 'signup'"
    )
    assert (
        apply_row_policies(df, table_dir, "stranger").count()
        == df.filter("event_type = 'signup'").count()
    )
    assert (
        apply_row_policies(df, table_dir, "analyst").count()
        == df.filter(
            "event_type IN ('click', 'view') OR event_type = 'signup'"
        ).count()
    )


def test_policy_lifecycle(spark, table_dir):
    names = {p["name"] for p in list_row_policies(table_dir)}
    assert "analyst_types" in names
    with pytest.raises(ValueError, match="already exists"):
        create_row_policy(
            table_dir, "analyst_types", "true", to_users=["analyst"]
        )
    create_row_policy(
        table_dir, "analyst_types", "event_type = 'click'",
        to_users=["analyst"], replace=True,
    )
    drop_row_policy(table_dir, "auditor_value")
    with pytest.raises(ValueError, match="no row policy"):
        drop_row_policy(table_dir, "auditor_value")
    with pytest.raises(ValueError, match="USING"):
        create_row_policy(table_dir, "empty", "  ")


def test_policy_filter_pushes_down(spark, table_dir):
    # the policy predicate must reach the python-DS scan as a pushed
    # filter — same plan shape as a user-written .filter()
    df = apply_row_policies(_df(spark, table_dir), table_dir, "analyst")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Filter" in plan
