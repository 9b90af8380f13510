"""Regression tests for the round-8 ADVICE findings fixed in round 9."""

from __future__ import annotations

import duckdb
import pytest

from conftest import SF_SMALL


def test_heavy_hitters_rejects_inexact_phi(spark):
    """phi_den > m loses the candidate-superset guarantee -> refuse."""
    from duckdb_extension_clickhouse_native_spark.operators import sketches

    with pytest.raises(ValueError, match="phi_den"):
        sketches.heavy_hitters_query(spark, SF_SMALL, m=10, phi_den=11)
    with pytest.raises(ValueError, match="phi_den"):
        sketches.heavy_hitters_weighted_query(spark, SF_SMALL, m=10, phi_den=11)
    # boundary: phi_den == m is exact and allowed
    df = sketches.heavy_hitters_query(spark, SF_SMALL, m=130, phi_den=130)
    assert df.count() >= 0


def test_sequence_count_description_matches_impl():
    """Registry text must not claim the DuckDB side uses list_reduce."""
    import __spark_entry__  # noqa: F401
    from duckdb_extension_clickhouse_native_spark.plans.base import REGISTRY

    q = REGISTRY.all()["events_sequence_count"]
    assert "list_reduce" not in q.description or "mis-fold" in q.description
    assert "recursive" in q.description.lower()


def test_media_decode_parity_on_non_ascii_and_null(spark, tmp_path):
    """The real-decode checksum must agree with the oracle even for
    non-ASCII and NULL text (the fixture is ASCII+non-null, so the
    old byte-vs-char divergence was latent — pin it with a hostile
    corpus)."""
    import pandas as pd

    from duckdb_extension_clickhouse_native_spark.functions import multimodal

    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": ["héllo wörld é€", None, "", "plain ascii"],
        }
    )
    d = str(tmp_path / "docs")
    spark.createDataFrame(pdf).write.parquet(d + "/documents.parquet")
    out = (
        multimodal.media_real_decode_query(spark, d)
        .orderBy("doc_id")
        .toPandas()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet/*.parquet'"
    )
    exp = con.execute(multimodal.MEDIA_REAL_DECODE_ORACLE_SQL).df()
    assert list(out["wsum_fp"]) == list(exp["wsum_fp"])
    assert list(out["width"]) == list(exp["width"])


def test_group_with_totals_null_order_pinned(spark):
    """A data-level NULL event_type group must order identically in
    Spark and DuckDB (NULLS LAST is now explicit)."""
    import pandas as pd

    from duckdb_extension_clickhouse_native_spark.operators.funnel import (
        GROUP_WITH_TOTALS_SQL,
    )

    pdf = pd.DataFrame(
        {
            "event_type": ["view", None, "click", None, "view"],
            "value": [1.0, 2.0, 3.0, 4.0, 5.0],
        }
    )
    spark.createDataFrame(pdf).createOrReplaceTempView("events")
    got = [r["event_type"] for r in spark.sql(GROUP_WITH_TOTALS_SQL).collect()]
    con = duckdb.connect()
    con.register("events", pdf)
    exp = [r[0] for r in con.execute(GROUP_WITH_TOTALS_SQL).fetchall()]
    assert got == exp  # NULL group in the same position on both engines
