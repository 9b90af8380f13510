"""Round-6 behavioral guarantees:

* ``load_tables`` keys its plan cache on the parquet's (mtime, size)
  content stamp — a table regenerated mid-process must serve the NEW
  data, not a plan over deleted part files.
* ``stream_native_sink_agg`` materializes its sink under the
  content-stamped fixture cache and is idempotent: re-running the query
  (even after the _DONE marker is removed, simulating an interrupted
  run) yields the same aggregate, resumed from the streaming
  checkpoint with no duplicate writes.
"""
from __future__ import annotations

import os
import shutil

from conftest import SF_SMALL


def test_table_cache_invalidates_on_parquet_rewrite(spark, tmp_path):
    import duckdb

    from duckdb_extension_clickhouse_native_spark.plans.base import load_tables

    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    for t in ("region", "nation"):
        shutil.copy(os.path.join(SF_SMALL, f"{t}.parquet"), os.path.join(sf, f"{t}.parquet"))
    n0 = load_tables(spark, sf, ["region"])["region"].count()
    assert n0 == 5
    # regenerate region with fewer rows (different bytes AND mtime)
    con = duckdb.connect()
    con.execute(
        f"COPY (SELECT * FROM '{SF_SMALL}/region.parquet' LIMIT 3) TO "
        f"'{sf}/region.parquet' (FORMAT PARQUET)"
    )
    os.utime(os.path.join(sf, "region.parquet"), (1, 1))
    n1 = load_tables(spark, sf, ["region"])["region"].count()
    assert n1 == 3, "stale plan served after the parquet was rewritten"


def test_stream_sink_idempotent_and_resumable(spark):
    import __spark_entry__  # noqa: F401 — populates REGISTRY
    from duckdb_extension_clickhouse_native_spark.plans.base import REGISTRY

    q = REGISTRY.all()["stream_native_sink_agg"]
    rows1 = {tuple(r) for r in q.build(spark, SF_SMALL).collect()}
    # simulate an interrupted run: _DONE gone, checkpoint + output kept
    import glob
    import tempfile

    marks = glob.glob(
        os.path.join(tempfile.gettempdir(), "chsql_native_fixtures", "*", "stream-sink-*", "_DONE")
    )
    assert marks, "sink cache dir with _DONE marker expected"
    for m in marks:
        os.remove(m)
    rows2 = {tuple(r) for r in q.build(spark, SF_SMALL).collect()}
    assert rows1 == rows2, "re-run after lost _DONE changed the sink aggregate"
