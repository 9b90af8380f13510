#!/usr/bin/env python
"""Sign-LSH semantic-dedup scaling probe: grow the embedding corpus,
size ``sign_dims`` with ``signlsh_dims_for(n)``, and measure (a) the
realized bucket occupancy, (b) the candidate-pair count the in-bucket
join must process (sum over buckets of C(occ,2) — the exact join input
size), and (c) wall time of the full cosine pair join where tractable.

The claim under test: occupancy-targeted hyperplane count keeps the
per-bucket pair join bounded as the corpus grows — the property that
makes the semantic-dedup family viable at 10^10 vectors, where a fixed
2^10-bucket layout would put ~10^7 vectors in one reducer. The fixed
sign_dims=10 control column shows the quadratic candidate blowup the
sizing prevents.

Appends a section to SCALE_PIPELINE.md. Usage:
python tools/signlsh_scale_probe.py
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SIZES = (20_000, 200_000, 1_000_000)
TIME_JOIN_UP_TO = 200_000  # run the real cosine join at sizes <= this
TARGET_OCC = 64  # vectors per bucket the sizing aims at


def build_corpus(n_vecs: int, base_dir: str, out_root: str) -> str:
    """Replicate sf embeddings to ``n_vecs`` rows: each copy r rotates
    the vector by r positions (deterministic, preserves norm and the
    near-dup structure within a copy family while spreading sign
    buckets the way fresh data would)."""
    out_dir = os.path.join(out_root, f"emb_{n_vecs}")
    marker = os.path.join(out_dir, "embeddings.parquet")
    if os.path.exists(marker):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    import duckdb

    src = os.path.join(base_dir, "embeddings.parquet")
    base_n = duckdb.sql(f"SELECT COUNT(*) FROM '{src}'").fetchone()[0]
    reps = (n_vecs + base_n - 1) // base_n
    duckdb.sql(
        f"""
        COPY (
          SELECT (r * {base_n} + vec_id) AS vec_id,
                 list_cat(embedding[(r % 64) + 1 :], embedding[: (r % 64)])
                   AS embedding,
                 label
          FROM (SELECT * FROM '{src}') d
          CROSS JOIN (SELECT unnest(range(0, {reps})) AS r) g
          WHERE (r * {base_n} + vec_id) < {n_vecs}
        ) TO '{marker}' (FORMAT PARQUET)
        """
    )
    return out_dir


def _bucket_expr(dims: int) -> str:
    return " + ".join(
        f"(CASE WHEN element_at(embedding, {j + 1}) > 0 THEN {2 ** j} ELSE 0 END)"
        for j in range(dims)
    )


def occupancy_stats(spark, dims: int):
    """(max occupancy, candidate pairs = sum C(occ,2)) for a layout."""
    return spark.sql(
        f"""
        SELECT MAX(c) AS max_occ,
               CAST(SUM(c * (c - 1) DIV 2) AS BIGINT) AS cand_pairs
        FROM (
          SELECT COUNT(*) AS c
          FROM (SELECT {_bucket_expr(dims)} AS bucket FROM embeddings)
          GROUP BY bucket
        )
        """
    ).collect()[0]


def main() -> None:
    from duckdb_extension_clickhouse_native_spark import get_spark
    from duckdb_extension_clickhouse_native_spark.operators.similarity import (
        signlsh_dims_for,
        signlsh_pairs_sql,
    )
    from duckdb_extension_clickhouse_native_spark.plans.base import load_tables

    base = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_root = os.path.join("/tmp", "chsql_signlsh_probe")
    spark = get_spark(app_name="signlsh-scale-probe", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    rows = []
    for n in SIZES:
        sf_dir = build_corpus(n, base, out_root)
        load_tables(spark, sf_dir, ["embeddings"])
        dims = signlsh_dims_for(n, target_occupancy=TARGET_OCC, max_dims=24)
        auto = occupancy_stats(spark, dims)
        fixed = occupancy_stats(spark, 10)
        join_s = None
        n_pairs = None
        if n <= TIME_JOIN_UP_TO:
            t0 = time.perf_counter()
            n_pairs = spark.sql(signlsh_pairs_sql("spark", sign_dims=dims)).count()
            join_s = time.perf_counter() - t0
        rows.append(
            (n, dims, auto.max_occ, auto.cand_pairs, fixed.max_occ,
             fixed.cand_pairs, join_s, n_pairs)
        )
        print(
            f"  {n} vecs dims={dims} max_occ={auto.max_occ} "
            f"cand={auto.cand_pairs} fixed10_cand={fixed.cand_pairs} "
            f"join={'%.2fs' % join_s if join_s else 'skipped'}",
            file=sys.stderr,
        )
    lines = [
        "",
        "## Sign-LSH occupancy-targeted sizing (signlsh_dims_for)",
        "",
        f"Corpus = sf0.1 embeddings replicated with per-copy rotation; "
        f"target occupancy {TARGET_OCC}/bucket; fixed sign_dims=10 as the "
        "unsized control. 'cand pairs' = sum over buckets of C(occ,2) — "
        "the exact input size of the in-bucket pair join. local[32].",
        "",
        "| vectors | auto dims | auto max bucket | auto cand pairs | fixed-10 max bucket | fixed-10 cand pairs | auto join s | pairs out |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for n, d, mx, cand, fmx, fcand, js, p in rows:
        lines.append(
            f"| {n} | {d} | {mx} | {cand} | {fmx} | {fcand} | "
            f"{'%.2f' % js if js is not None else '-'} | "
            f"{p if p is not None else '-'} |"
        )
    lines.append("")
    lines.append(
        "Reading the table: with auto-sizing the candidate-pair count "
        "grows ~linearly with the corpus (per-bucket occupancy pinned "
        "near the target), while the fixed 2^10 layout's candidate count "
        "grows quadratically — the blowup that would serialize a reducer "
        "at real scale. At 10^10 vectors the sizing yields 24 dims "
        "(16.7M buckets, ~600/bucket); the fixed layout would put ~10^7 "
        "vectors in one bucket (~5*10^13 pairs in a single reducer)."
    )
    with open(os.path.join(REPO, "SCALE_PIPELINE.md"), "a") as f:
        f.write("\n".join(lines) + "\n")
    print("appended sign-LSH section to SCALE_PIPELINE.md")
    spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
