#!/usr/bin/env python
"""PageRank scaling probe: grow the events table (users grow with the
corpus, co-occurrence keys stay fixed) and record edge count + wall
time. The claim under test is the cap-bound: edges <= |keys| *
max_members**2 REGARDLESS of corpus size, so the 10-iteration loop's
cost is flat while only the one-pass membership scan grows linearly.
An uncapped co-occurrence graph would grow edges quadratically in
users-per-key — the blowup the ``max_members`` rank filter exists to
exclude structurally (same design rule as the n-gram df-cap).

Appends a section to SCALE_PIPELINE.md. Usage:
python tools/pagerank_scale_probe.py
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SIZES = (100_000, 400_000, 1_000_000)


def build_events(n_rows: int, base_dir: str, out_root: str) -> str:
    """Replicate sf0.1 events to ``n_rows`` with a per-copy user_id
    offset: users scale with the corpus, the ~100 `props.k` keys do
    not — exactly the shape that melts an uncapped co-occurrence
    join. Cached by size."""
    out_dir = os.path.join(out_root, f"events_{n_rows}")
    marker = os.path.join(out_dir, "events.parquet")
    if os.path.exists(marker):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    import duckdb

    src = os.path.join(base_dir, "events.parquet")
    reps = (n_rows + 99_999) // 100_000
    duckdb.sql(
        f"""
        COPY (
          SELECT event_id + r.i * 1000000 AS event_id,
                 ts,
                 user_id + r.i * 100000 AS user_id,
                 event_type, value, props
          FROM '{src}', range({reps}) AS r(i)
          LIMIT {n_rows}
        ) TO '{marker}' (FORMAT PARQUET)
        """
    )
    return out_dir


def main() -> None:
    import tempfile

    from duckdb_extension_clickhouse_native_spark import get_spark
    import __spark_entry__  # noqa: F401
    from duckdb_extension_clickhouse_native_spark.operators.components import (
        pagerank_query,
    )
    from duckdb_extension_clickhouse_native_spark.plans.base import load_tables

    base_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_root = os.path.join(tempfile.gettempdir(), "chsql_pagerank_probe")
    spark = get_spark(app_name="pagerank-scale-probe", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")

    rows = []
    for n in SIZES:
        d = build_events(n, base_dir, out_root)
        # edge count under the cap (the bound being demonstrated)
        t = load_tables(spark, d, ["events"])
        n_edges = spark.sql(
            """
            WITH ev AS (
              SELECT user_id,
                     CAST(regexp_extract(props, '"k": (-?[0-9]+)', 1) AS BIGINT) AS k
              FROM events
            ),
            cnt AS (SELECT k, user_id, COUNT(*) AS c FROM ev GROUP BY k, user_id),
            mem AS (
              SELECT k, user_id FROM (
                SELECT k, user_id,
                       ROW_NUMBER() OVER (PARTITION BY k ORDER BY c DESC, user_id) AS rn
                FROM cnt
              ) ranked WHERE rn <= 20
            )
            SELECT COUNT(*) AS n FROM (
              SELECT DISTINCT a.user_id AS src, b.user_id AS dst
              FROM mem a JOIN mem b ON a.k = b.k AND a.user_id <> b.user_id
            ) e
            """
        ).collect()[0]["n"]
        n_users = t["events"].select("user_id").distinct().count()
        best = None
        for _ in range(2):
            t0 = time.time()
            out = pagerank_query(spark, d).collect()
            sec = time.time() - t0
            best = sec if best is None else min(best, sec)
        rows.append((n, n_users, n_edges, best, len(out)))
        print(
            f"  {n} events / {n_users} users: edges={n_edges} {best:.2f}s",
            file=sys.stderr,
        )

    lines = [
        "",
        "## PageRank membership-cap bound (pagerank_user_cooccurrence)",
        "",
        "Corpus = sf0.1 events replicated with per-copy user offsets "
        "(users grow linearly, the ~100 co-occurrence keys do not), "
        "max_members=20, 10 iterations, local[32], best of 2.",
        "",
        "| events | users | capped edges | seconds | rows |",
        "|---|---|---|---|---|",
    ]
    for n, nu, ne, sec, nr in rows:
        lines.append(f"| {n} | {nu} | {ne} | {sec:.2f} | {nr} |")
    r0, r2 = rows[0], rows[-1]
    lines += [
        "",
        f"{r2[0] // r0[0]}x events / {r2[1] // max(r0[1], 1)}x users -> "
        f"{r2[2] / max(r0[2], 1):.2f}x edges, {r2[3] / r0[3]:.1f}x time. "
        "Uncapped, edges would grow with users-per-key squared "
        "(~100x here); the rank filter pins the per-key join input at "
        "C(20,2) pairs, so iteration cost is corpus-size-independent "
        "and only the one-pass membership scan grows.",
    ]
    with open(os.path.join(REPO, "SCALE_PIPELINE.md"), "a") as f:
        f.write("\n".join(lines) + "\n")
    print("appended PageRank section to SCALE_PIPELINE.md")
    spark.stop()


if __name__ == "__main__":
    main()
