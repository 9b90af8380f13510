#!/usr/bin/env python
"""Round-8 sketch/fold/join family scaling probe: heavy hitters,
sequenceCount, deltaSum, histogram, SummingMerge and the binned
time-window join over grown events corpora (the PageRank probe's
replicated fixtures — users scale with the corpus).

Claims under test at 10x events:
* events_heavy_hitters — the candidate stage emits <= m+1 rows per
  Arrow batch REGARDLESS of corpus size, and the verify recount only
  shuffles candidate rows: ~linear;
* events_sequence_count / events_delta_sum / events_histogram /
  events_summing_merge — one keyed pass each: linear;
* join_time_window_binned — the bin equi-join touches only
  temporally-local pairs (bin width fixed), so output and work grow
  ~linearly with events, where the naive non-equi form grows n^2.

Appends a section to SCALE_PIPELINE.md. Usage:
python tools/sketch_scale_probe.py
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SIZES = (100_000, 400_000, 1_000_000)
QUERIES = (
    "events_heavy_hitters",
    "events_sequence_count",
    "events_delta_sum",
    "events_histogram",
    "events_summing_merge",
    "join_time_window_binned",
)


def main() -> None:
    import tempfile

    import __spark_entry__  # noqa: F401
    from duckdb_extension_clickhouse_native_spark import get_spark
    from duckdb_extension_clickhouse_native_spark.plans.base import REGISTRY
    from tools.pagerank_scale_probe import build_events

    base_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_root = os.path.join(tempfile.gettempdir(), "chsql_pagerank_probe")
    spark = get_spark(app_name="sketch-scale-probe", cpus=32)
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
        "## Sketch / fold / binned-join family scaling (round 8)",
        "",
        "Corpus = sf0.1 events replicated with per-copy user offsets "
        "(same fixtures as the PageRank probe), local[32], best of 2. "
        "Heavy hitters' candidate stage is bounded per batch; every "
        "other query is one keyed pass; the binned join touches only "
        "temporally-local pairs.",
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
    print("appended sketch-family section to SCALE_PIPELINE.md")
    spark.stop()


if __name__ == "__main__":
    main()
