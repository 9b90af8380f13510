#!/usr/bin/env python
"""Scale probes for the two r7 flagship additions (VERDICT r7 item 4):

1. ``rag_pipeline_topk`` over 10x-grown document corpora — the chunk
   explode + chunk-BM25 branch is the part that scales with docs; the
   claim is ~linear growth (broadcast fusion joins stay bounded).
2. ``dedup_substring_spans`` under adversarial BOILERPLATE skew —
   every doc carries the same appended paragraph, so its w-grams are
   hot keys. The plan's COUNT-OVER stage is a WINDOW partitioned by
   gram: AQE's skew splitting only applies to joins, so a hot gram
   lands on one reducer whole. This probe measures how much that
   actually costs vs a uniform corpus of the same size.

Appends both tables to SCALE_PIPELINE.md. Usage:
python tools/rag_scale_probe.py
"""

from __future__ import annotations

import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.dedup_scale_probe import build_corpus  # noqa: E402

SIZES = (5_000, 20_000, 50_000)
BOILERPLATE_TOKENS = 100
BOILER_DOCS = 50_000


def build_boilerplate_corpus(n_docs: int, base_dir: str, out_root: str) -> str:
    """Grown corpus where EVERY doc ends with the same
    ``BOILERPLATE_TOKENS``-token paragraph — the license-header /
    template-footer shape that makes substring-dedup gram keys hot."""
    out_dir = os.path.join(out_root, f"boiler_{n_docs}")
    marker = os.path.join(out_dir, "documents.parquet")
    if os.path.exists(marker):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    import duckdb

    src = os.path.join(base_dir, "documents.parquet")
    reps = (n_docs + 4999) // 5000
    boiler = " ".join(f"bp{i}" for i in range(BOILERPLATE_TOKENS))
    duckdb.sql(
        f"""
        COPY (
          SELECT (r * 5000 + doc_id) AS doc_id,
                 CASE WHEN r = 0 THEN text
                      ELSE 'v' || CAST(r AS VARCHAR) || ' ' || text END
                   || ' {boiler}' AS text,
                 lang, source, n_chars
          FROM (SELECT * FROM '{src}') d
          CROSS JOIN (SELECT unnest(range(0, {reps})) AS r) g
          WHERE (r * 5000 + doc_id) < {n_docs}
        ) TO '{marker}' (FORMAT PARQUET)
        """
    )
    return out_dir


def _with_embeddings(sf_dir: str, base_dir: str) -> str:
    dst = os.path.join(sf_dir, "embeddings.parquet")
    if not os.path.exists(dst):
        shutil.copy(os.path.join(base_dir, "embeddings.parquet"), dst)
    return sf_dir


def _best_of(q, spark, sf_dir: str, runs: int = 2):
    best, n_out = float("inf"), 0
    for _ in range(runs):
        t0 = time.perf_counter()
        n_out = q.build(spark, sf_dir).count()
        best = min(best, time.perf_counter() - t0)
    return best, n_out


def main() -> None:
    from duckdb_extension_clickhouse_native_spark import get_spark
    from duckdb_extension_clickhouse_native_spark.plans import pipeline  # noqa: F401
    from duckdb_extension_clickhouse_native_spark.plans.base import REGISTRY

    base = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_root = os.path.join("/tmp", "chsql_dedup_probe")
    spark = get_spark(app_name="rag-scale-probe", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    all_q = REGISTRY.all()
    spark.range(1000).selectExpr("sum(id)").collect()

    rag_rows = []
    q = all_q["rag_pipeline_topk"]
    for n in SIZES:
        sf_dir = _with_embeddings(build_corpus(n, base, out_root), base)
        best, n_out = _best_of(q, spark, sf_dir)
        rag_rows.append((n, best, n_out))
        print(f"  rag {n} docs: {best:.2f}s ({n_out} rows)", file=sys.stderr)

    sub = all_q["dedup_substring_spans"]
    uni_dir = build_corpus(BOILER_DOCS, base, out_root)
    boi_dir = build_boilerplate_corpus(BOILER_DOCS, base, out_root)
    t_uni, n_uni = _best_of(sub, spark, uni_dir)
    t_boi, n_boi = _best_of(sub, spark, boi_dir)
    print(
        f"  substring {BOILER_DOCS} uniform: {t_uni:.2f}s ({n_uni}); "
        f"boilerplate: {t_boi:.2f}s ({n_boi})",
        file=sys.stderr,
    )

    target = os.path.join(REPO, "SCALE_PIPELINE.md")
    with open(target, "a") as f:
        f.write(
            "\n\n## RAG pipeline scaling (rag_pipeline_topk)\n\n"
            "Grown document corpora (same fixtures as the dedup probe), "
            "base embeddings (the semantic branch is top-k-bounded by "
            "construction), local[32], best of 2.\n\n"
            "| docs | seconds | result rows |\n|---|---|---|\n"
        )
        for n, sec, n_out in rag_rows:
            f.write(f"| {n} | {sec:.2f} | {n_out} |\n")
        r = rag_rows[-1][1] / rag_rows[0][1]
        f.write(
            f"\n{SIZES[-1] // SIZES[0]}x docs -> {r:.1f}x time.\n"
            "\n\n## Substring-span dedup under boilerplate skew\n\n"
            f"{BOILER_DOCS} docs, the boilerplate corpus appends the SAME "
            f"{BOILERPLATE_TOKENS}-token paragraph to every doc "
            f"(~{BOILERPLATE_TOKENS - 7} hot grams x {BOILER_DOCS} "
            "occurrences each). The COUNT stage is keyed by gram; hot "
            "keys concentrate on few reducers (window partitioning is "
            "not split by AQE — only joins are).\n\n"
            "| corpus | seconds | result rows |\n|---|---|---|\n"
            f"| uniform | {t_uni:.2f} | {n_uni} |\n"
            f"| boilerplate | {t_boi:.2f} | {n_boi} |\n"
            f"\nSkew cost: {t_boi / t_uni:.2f}x.\n"
        )
    print("appended SCALE_PIPELINE.md")
    spark.stop()


if __name__ == "__main__":
    main()
