#!/usr/bin/env python
"""Pipeline-operator scaling probe: run the dedup flagships over
synthetically grown corpora (the sf0.1 documents replicated with
deterministic token perturbations, so near-dup structure survives) and
record wall time vs corpus size.

The claim under test is the one that matters at 100 TB: the df-capped
inverted index (ngram), the banded signature join (MinHash LSH) and
the band-bucketed hamming join (SimHash) are LINEAR in corpus size —
their per-reducer work is bounded by construction, so doubling the
corpus doubles the time instead of quadrupling the pair space.

Writes SCALE_PIPELINE.md. Usage: python tools/dedup_scale_probe.py
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SIZES = (5_000, 20_000, 50_000)
QUERIES = (
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    # one COUNT-OVER pass on w-grams + islands merge: occurrence-linear
    # by construction (no pair stage exists to explode)
    "dedup_substring_spans",
)


def build_corpus(n_docs: int, base_dir: str, out_root: str) -> str:
    """Replicate the sf0.1 documents to ``n_docs`` rows with a
    deterministic per-copy token prefix (keeps shingle overlap inside a
    copy family, breaks exact equality). Cached by size."""
    out_dir = os.path.join(out_root, f"docs_{n_docs}")
    marker = os.path.join(out_dir, "documents.parquet")
    if os.path.exists(marker):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    import duckdb

    src = os.path.join(base_dir, "documents.parquet")
    reps = (n_docs + 4999) // 5000
    duckdb.sql(
        f"""
        COPY (
          SELECT (r * 5000 + doc_id) AS doc_id,
                 CASE WHEN r = 0 THEN text
                      ELSE 'v' || CAST(r AS VARCHAR) || ' ' || text END AS text,
                 lang, source, n_chars
          FROM (SELECT * FROM '{src}') d
          CROSS JOIN (SELECT unnest(range(0, {reps})) AS r) g
          WHERE (r * 5000 + doc_id) < {n_docs}
        ) TO '{marker}' (FORMAT PARQUET)
        """
    )
    return out_dir


def main() -> None:
    from duckdb_extension_clickhouse_native_spark import get_spark
    from duckdb_extension_clickhouse_native_spark.plans import pipeline  # noqa: F401
    from duckdb_extension_clickhouse_native_spark.plans.base import REGISTRY

    base = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_root = os.path.join("/tmp", "chsql_dedup_probe")
    spark = get_spark(app_name="dedup-scale-probe", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    all_q = REGISTRY.all()
    rows = []
    for n in SIZES:
        sf_dir = build_corpus(n, base, out_root)
        for qname in QUERIES:
            q = all_q[qname]
            best = float("inf")
            n_out = 0
            for _ in range(2):
                t0 = time.perf_counter()
                n_out = q.build(spark, sf_dir).count()
                best = min(best, time.perf_counter() - t0)
            rows.append((n, qname, best, n_out))
            print(f"  {n} docs {qname}: {best:.2f}s ({n_out} rows)", file=sys.stderr)

    # preserve sections other probes appended (e.g. the sign-LSH
    # occupancy-sizing table from tools/signlsh_scale_probe.py)
    target = os.path.join(REPO, "SCALE_PIPELINE.md")
    appended = ""
    if os.path.exists(target):
        old = open(target).read()
        idx = old.find("\n## Sign-LSH")
        if idx >= 0:
            appended = old[idx:]
    with open(target, "w") as f:
        f.write(
            "# Pipeline-operator scaling (dedup flagships)\n\n"
            "Corpus = sf0.1 documents replicated with deterministic "
            "per-copy token prefixes (near-dup families preserved), "
            "local[32], best of 2.\n\n"
            "The bounded-reducer designs (df-cap, banded LSH, hamming "
            "bands) should scale ~linearly in corpus size; a quadratic "
            "pair explosion would show as 100x time at 10x docs.\n\n"
            "| docs | query | seconds | result rows |\n|---|---|---|---|\n"
        )
        for n, qname, sec, n_out in rows:
            f.write(f"| {n} | {qname} | {sec:.2f} | {n_out} |\n")
        by_q: dict = {}
        for n, qname, sec, _ in rows:
            by_q.setdefault(qname, {})[n] = sec
        f.write("\n## Scaling factors (time ratio vs 10x docs)\n\n")
        for qname, d in by_q.items():
            if SIZES[0] in d and SIZES[2] in d:
                f.write(
                    f"- {qname}: {SIZES[2] // SIZES[0]}x docs -> "
                    f"{d[SIZES[2]] / d[SIZES[0]]:.1f}x time\n"
                )
        if appended:
            f.write(appended)
    print("wrote SCALE_PIPELINE.md")
    spark.stop()


if __name__ == "__main__":
    main()
