#!/usr/bin/env python
"""Round-10 additions scaling probe: the statistical-test aggregates
(MWU / KS — two-phase distinct-value forms), WITH FILL calendar,
timed sequenceMatch (user-keyed range join), line-level dedup and
ngramDistance over grown corpora.

The claims: the stats tests group by distinct cents value FIRST
(map-side combinable; the window then runs over the tiny distinct-value
relation), so 10x events ~ 10x map work with constant window cost;
WITH FILL joins a types-x-days calendar that does not grow with rows;
sequence_match_timed is an equi-join on user_id whose per-user groups
stay constant-size as users scale with the corpus; line dedup is one
explode + hash groupBy; ngramDistance is map-only + top-k.

Noop-sink materialized, best-of-2.  Appends to SCALE_PIPELINE.md.
Usage: python tools/stats_scale_probe.py
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SIZES = (100_000, 400_000, 1_000_000)
EVENT_QUERIES = (
    "stats_mann_whitney_u",
    "stats_ks_distance",
    "stats_welch_ttest",
    "events_with_fill_step",
    "events_sequence_match_timed",
    "events_limit_by_offset",
    # r10 late tranches: AUC groups by distinct cents value first
    # (same two-phase shape as MWU/KS); strict funnel is one
    # user-keyed window pass; cumulative uniques aggregates to
    # first-seen days before its bounded prefix window
    "stats_roc_auc",
    "events_window_funnel_strict",
    "events_cumulative_uniques",
)
DOC_SIZES = (10_000, 40_000, 100_000)
DOC_QUERIES = ("dedup_line_level", "text_ngram_distance")


def build_docs(n_rows: int, base_dir: str, out_root: str) -> str:
    out_dir = os.path.join(out_root, f"docs_{n_rows}")
    marker = os.path.join(out_dir, "documents.parquet")
    if os.path.exists(marker):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    import duckdb

    src = os.path.join(base_dir, "documents.parquet")
    n_src = duckdb.sql(f"SELECT COUNT(*) FROM '{src}'").fetchone()[0]
    reps = (n_rows + n_src - 1) // n_src
    duckdb.sql(
        f"""
        COPY (
          SELECT doc_id + r.i * 10000000 AS doc_id, text, lang, source,
                 n_chars
          FROM '{src}', range({reps}) AS r(i)
          LIMIT {n_rows}
        ) TO '{marker}' (FORMAT PARQUET)
        """
    )
    return out_dir


def main() -> None:
    import tempfile

    import __spark_entry__  # noqa: F401
    from duckdb_extension_clickhouse_native_spark import get_spark
    from duckdb_extension_clickhouse_native_spark.plans.base import REGISTRY
    from tools.pagerank_scale_probe import build_events

    base_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_root = os.path.join(tempfile.gettempdir(), "chsql_pagerank_probe")
    doc_root = os.path.join(tempfile.gettempdir(), "chsql_stats_probe")
    spark = get_spark(app_name="stats-scale-probe", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")

    rows = []
    for n in SIZES:
        d = build_events(n, base_dir, out_root)
        for qname in EVENT_QUERIES:
            q = REGISTRY.all()[qname]
            best = None
            for _ in range(2):
                df = q.build(spark, d)
                t0 = time.time()
                df.write.format("noop").mode("overwrite").save()
                sec = time.time() - t0
                best = sec if best is None else min(best, sec)
            n_out = q.build(spark, d).count()
            rows.append((f"{n:,} events", qname, best, n_out))
            print(f"  {n} events {qname}: {best:.2f}s ({n_out})", file=sys.stderr)
    for n in DOC_SIZES:
        d = build_docs(n, base_dir, doc_root)
        for qname in DOC_QUERIES:
            q = REGISTRY.all()[qname]
            best = None
            for _ in range(2):
                df = q.build(spark, d)
                t0 = time.time()
                df.write.format("noop").mode("overwrite").save()
                sec = time.time() - t0
                best = sec if best is None else min(best, sec)
            n_out = q.build(spark, d).count()
            rows.append((f"{n:,} docs", qname, best, n_out))
            print(f"  {n} docs {qname}: {best:.2f}s ({n_out})", file=sys.stderr)

    lines = [
        "",
        "## Round-10 additions vs corpus size",
        "",
        "Noop-sink materialized, best-of-2, local[32]; events fixtures "
        "replicate sf0.1 events with fresh users per copy, docs "
        "fixtures replicate sf0.1 documents with fresh doc ids.",
        "",
        "| corpus | query | seconds | output rows |",
        "|---|---|---|---|",
    ]
    for label, qname, sec, n_out in rows:
        lines.append(f"| {label} | {qname} | {sec:.2f} | {n_out:,} |")
    with open(os.path.join(REPO, "SCALE_PIPELINE.md"), "a") as f:
        f.write("\n".join(lines) + "\n")
    print("appended to SCALE_PIPELINE.md", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
