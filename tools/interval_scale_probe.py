#!/usr/bin/env python
"""Interval-analytics scaling probe: run the round-9 interval/series
family (maxIntersections sweep line, intervalLengthSum islands,
moving sum, dyadic EMA, LTTB, boundingRatio, sequenceNextNode) over
grown events corpora and record wall time vs corpus size.

The claim: every query is one (or two stacked) partition-keyed window
passes plus a grouped aggregate — linear in events with no pair
blowup — except LTTB, whose only non-linear structure is a 24-row
bucket relation broadcast back onto the points.  So 10x events should
cost ~10x (bounded below by fixed per-query overhead at these sizes).

Timing materializes ALL output columns via the noop DSv2 sink (the
bench methodology — count() would let Catalyst prune window bodies).

Appends a section to SCALE_PIPELINE.md. Usage:
python tools/interval_scale_probe.py
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SIZES = (100_000, 400_000, 1_000_000)
QUERIES = (
    "events_max_intersections",
    "events_interval_length_sum",
    "events_moving_sum",
    "events_exp_moving_avg",
    "events_lttb_downsample",
    "events_bounding_ratio",
    "events_sequence_next_node",
)


def main() -> None:
    import tempfile

    from duckdb_extension_clickhouse_native_spark import get_spark
    import __spark_entry__  # noqa: F401
    from duckdb_extension_clickhouse_native_spark.plans.base import REGISTRY
    from tools.pagerank_scale_probe import build_events

    base_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_root = os.path.join(tempfile.gettempdir(), "chsql_pagerank_probe")
    spark = get_spark(app_name="interval-scale-probe", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")

    rows = []
    for n in SIZES:
        d = build_events(n, base_dir, out_root)
        for qname in QUERIES:
            q = REGISTRY.all()[qname]
            best = None
            for _ in range(2):
                df = q.build(spark, d)
                t0 = time.time()
                df.write.format("noop").mode("overwrite").save()
                sec = time.time() - t0
                best = sec if best is None else min(best, sec)
            n_out = q.build(spark, d).count()
            rows.append((n, qname, best, n_out))
            print(f"  {n} events {qname}: {best:.2f}s ({n_out} rows)", file=sys.stderr)

    lines = [
        "",
        "## Interval/series analytics vs corpus size (round 9)",
        "",
        "Noop-sink materialized (full output columns), best-of-2, "
        "local[32]; fixtures replicate the sf0.1 events table with "
        "fresh user ids per copy (users scale with the corpus).",
        "",
        "| events | query | seconds | output rows |",
        "|---|---|---|---|",
    ]
    for n, qname, sec, n_out in rows:
        lines.append(f"| {n:,} | {qname} | {sec:.2f} | {n_out:,} |")
    base = {q: s for n, q, s, _ in rows if n == SIZES[0]}
    worst = max(
        (s / base[q], q) for n, q, s, _ in rows if n == SIZES[-1]
    )
    lines.append("")
    lines.append(
        f"{SIZES[-1] // SIZES[0]}x events cost at most "
        f"{worst[0]:.1f}x wall ({worst[1]}) across the family — "
        "consistent with one partition-keyed window pass per query "
        "(no pair blowup)."
    )
    with open(os.path.join(REPO, "SCALE_PIPELINE.md"), "a") as f:
        f.write("\n".join(lines) + "\n")
    print("appended to SCALE_PIPELINE.md", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
