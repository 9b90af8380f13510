#!/usr/bin/env python
"""Event-analytics scaling probe: run the funnel/retention/sequence/
gap-fill family over grown events corpora (reusing the PageRank
probe's replicated fixtures — users scale with the corpus) and record
wall time vs corpus size. The claim: every query in the family is one
user-keyed (or type-keyed) window/aggregation pass — linear in events,
no pair blowup anywhere — so 10x events ~ 10x work, bounded below by
Spark's fixed per-query overhead at these absolute sizes.

Appends a section to SCALE_PIPELINE.md. Usage:
python tools/events_scale_probe.py
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SIZES = (100_000, 400_000, 1_000_000)
QUERIES = (
    "events_window_funnel",
    "events_sequence_match",
    "events_retention_cohorts",
    "events_gap_fill_locf",
    "events_replacing_merge",
)


def main() -> None:
    import tempfile

    from duckdb_extension_clickhouse_native_spark import get_spark
    import __spark_entry__  # noqa: F401
    from duckdb_extension_clickhouse_native_spark.plans.base import REGISTRY
    from tools.pagerank_scale_probe import build_events

    base_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_root = os.path.join(tempfile.gettempdir(), "chsql_pagerank_probe")
    spark = get_spark(app_name="events-scale-probe", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")

    rows = []
    for n in SIZES:
        d = build_events(n, base_dir, out_root)
        for qname in QUERIES:
            q = REGISTRY.all()[qname]
            best = None
            for _ in range(2):
                t0 = time.time()
                n_out = q.build(spark, d).count()
                sec = time.time() - t0
                best = sec if best is None else min(best, sec)
            rows.append((n, qname, best, n_out))
            print(f"  {n} events {qname}: {best:.2f}s ({n_out} rows)", file=sys.stderr)

    lines = [
        "",
        "## Event-analytics family scaling (funnel / retention / sequence / fill / FINAL)",
        "",
        "Corpus = sf0.1 events replicated with per-copy user offsets "
        "(same fixtures as the PageRank probe), local[32], best of 2. "
        "Every query is a single keyed window/aggregation pass — "
        "linear in events by construction.",
        "",
        "| events | query | seconds | result rows |",
        "|---|---|---|---|",
    ]
    for n, qname, sec, n_out in rows:
        lines.append(f"| {n} | {qname} | {sec:.2f} | {n_out} |")
    by_q: dict = {}
    for n, qname, sec, _ in rows:
        by_q.setdefault(qname, {})[n] = sec
    lines += ["", "10x events time ratios:", ""]
    for qname, d in by_q.items():
        if SIZES[0] in d and SIZES[2] in d:
            lines.append(
                f"- {qname}: {d[SIZES[2]] / d[SIZES[0]]:.1f}x time at 10x events"
            )
    with open(os.path.join(REPO, "SCALE_PIPELINE.md"), "a") as f:
        f.write("\n".join(lines) + "\n")
    print("appended event-analytics section to SCALE_PIPELINE.md")
    spark.stop()


if __name__ == "__main__":
    main()
