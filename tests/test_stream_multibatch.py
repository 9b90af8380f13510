"""Multi-micro-batch stateful streaming: with events split over several
files (one file per trigger), update-mode emits intermediate states —
the conformance entry must still reduce to exactly the batch oracle."""

from __future__ import annotations

import os

import duckdb
import pyarrow.parquet as pq

from conftest import SF_SMALL


def test_stateful_sessions_across_micro_batches(spark, tmp_path):
    # synthetic sf_dir whose events.parquet is a DIRECTORY of 3 parts:
    # the file stream source then runs 3 micro-batches
    sf = str(tmp_path / "sf")
    ev_dir = os.path.join(sf, "events.parquet")
    os.makedirs(ev_dir)
    t = pq.read_table(f"{SF_SMALL}/events.parquet")
    n = t.num_rows
    per = (n + 2) // 3
    for i in range(3):
        piece = t.slice(i * per, per)
        if piece.num_rows:
            pq.write_table(piece, os.path.join(ev_dir, f"part-{i}.parquet"))

    from duckdb_extension_clickhouse_native_spark.plans.streaming_queries import (
        _stream_stateful_sessions,
    )

    got = {
        r["user_id"]: (r["session_no"], r["n_events"])
        for r in _stream_stateful_sessions(spark, sf).collect()
    }

    con = duckdb.connect()
    expect_rows = con.execute(
        f"""
        WITH e AS (
          SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) / 1000000.0 AS t
          FROM '{ev_dir}/*.parquet'
        ),
        marked AS (
          SELECT user_id, t,
                 CASE WHEN lag(t) OVER w IS NULL OR t - lag(t) OVER w > 1800
                      THEN 1 ELSE 0 END AS new_s
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t)
        ),
        sessions AS (
          SELECT user_id, t,
                 SUM(new_s) OVER (PARTITION BY user_id ORDER BY t
                                  ROWS UNBOUNDED PRECEDING) AS sess
          FROM marked
        )
        SELECT user_id, MAX(sess) AS session_no,
               COUNT(*) FILTER (WHERE sess = (SELECT MAX(s2.sess) FROM sessions s2
                                              WHERE s2.user_id = sessions.user_id)) AS n_events
        FROM sessions GROUP BY user_id
        """
    ).fetchall()
    expect = {u: (s, ne) for u, s, ne in expect_rows}
    assert got == expect
