"""Embedding clustering: fixed-iteration k-means (Lloyd) in exact
fixed-point arithmetic.

The pipeline use-case: cluster an embedding column for semantic dedup
/ topic bucketing / diversity sampling. K-means is iterative, but a
FIXED number of Lloyd iterations is expressible as a chain of CTEs —
so the whole thing stays declarative in both engines and the oracle
check is exact.

Exactness (the hard part for a cross-engine clustering oracle):
* coordinates are floored to 1e-6 fixed-point BIGINTs — exact in both
  engines (FLOOR of the same double);
* distances are pure BIGINT sums of squares — associative, order-free;
* centroid updates quantize back to BIGINT via FLOOR(sum/count) with
  the sum exact in double (|sum| < 2^53) — identical everywhere;
* seeds are the k smallest md5(vec_id) — deterministic, no RNG.
So assignments, inertia, and cluster sizes are bit-identical across
Spark and DuckDB: a *clustering* result you can hash-compare.

Scale shape: vectors are dimension-exploded once; the per-iteration
centroid join broadcasts (k x dim rows); the (vec_id, cid) distance
aggregation collapses map-side (all dims of a vector sit in the same
input partition), so the shuffle carries k rows per vector, not
k x dim. At real scale you'd swap the exploded join for a broadcast
numpy centroid matrix inside mapInPandas (one BLAS distance matrix
per batch) — same driver loop, fewer rows in flight; this SQL form is
the portable, oracle-checkable shape.
"""

from __future__ import annotations

SCALE = 10**6


def kmeans_sql(dialect: str, k: int = 8, iters: int = 2, dim: int = 64) -> str:
    """Per-cluster summary after ``iters`` Lloyd iterations:
    (cid, n_members, inertia, rep_vec). Inertia is the exact
    fixed-point sum of squared distances (BIGINT)."""
    s = "STRING" if dialect == "spark" else "VARCHAR"
    if dialect == "spark":
        explode_dims = (
            "SELECT vec_id, d + 1 AS d, CAST(FLOOR(CAST(v AS DOUBLE) * "
            f"{SCALE}) AS BIGINT) AS xf "
            "FROM embeddings LATERAL VIEW posexplode(embedding) t AS d, v"
        )
    else:
        explode_dims = (
            "SELECT vec_id, generate_subscripts(embedding, 1) AS d, "
            f"CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * {SCALE}) AS BIGINT) AS xf "
            "FROM embeddings"
        )
    # Spark-only broadcast hints: the centroid table (k x dim rows) and
    # the per-vector assignment (1 row/vector vs dim rows/vector in
    # vecs) are always the small sides — Catalyst's size estimates for
    # CTE outputs miss this and fall back to sort-merge. DuckDB ignores
    # hints it never sees (the oracle text simply omits them).
    h_cent = "/*+ BROADCAST(c) */ " if dialect == "spark" else ""
    h_best = "/*+ BROADCAST(b) */ " if dialect == "spark" else ""
    h_means = "/*+ BROADCAST(m) */ " if dialect == "spark" else ""
    parts = [
        f"vecs AS ({explode_dims})",
        f"""seeds AS (
      SELECT vec_id,
             ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS {s})), vec_id) - 1 AS cid
      FROM embeddings
    )""",
        """cent0 AS (
      SELECT s.cid, v.d, v.xf AS cf
      FROM seeds s JOIN vecs v ON s.vec_id = v.vec_id
      WHERE s.cid < %d
    )""" % k,
    ]
    for t in range(iters):
        parts.append(f"""assign{t} AS (
      SELECT {h_cent}v.vec_id, c.cid, SUM((v.xf - c.cf) * (v.xf - c.cf)) AS dist
      FROM vecs v JOIN cent{t} c ON v.d = c.d
      GROUP BY v.vec_id, c.cid
    )""")
        parts.append(f"""best{t} AS (
      SELECT vec_id, cid, dist FROM (
        SELECT vec_id, cid, dist,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
        FROM assign{t}
      ) r WHERE rn = 1
    )""")
        # FLOOR(sum/count) instead of integer division: Spark DIV
        # truncates toward zero, DuckDB // floors — they disagree on
        # negative sums; FLOOR of the (exact) double agrees everywhere
        parts.append(f"""means{t} AS (
      SELECT {h_best}b.cid, v.d,
             CAST(FLOOR(CAST(SUM(v.xf) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cf
      FROM best{t} b JOIN vecs v ON b.vec_id = v.vec_id
      GROUP BY b.cid, v.d
    )""")
        # empty clusters keep their previous centroid (deterministic)
        parts.append(f"""cent{t + 1} AS (
      SELECT {h_means}o.cid, o.d, COALESCE(m.cf, o.cf) AS cf
      FROM cent{t} o LEFT JOIN means{t} m ON o.cid = m.cid AND o.d = m.d
    )""")
    # final assignment against the post-iteration centroids
    parts.append(f"""assign_final AS (
      SELECT {h_cent}v.vec_id, c.cid, SUM((v.xf - c.cf) * (v.xf - c.cf)) AS dist
      FROM vecs v JOIN cent{iters} c ON v.d = c.d
      GROUP BY v.vec_id, c.cid
    )""")
    parts.append("""best_final AS (
      SELECT vec_id, cid, dist FROM (
        SELECT vec_id, cid, dist,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
        FROM assign_final
      ) r WHERE rn = 1
    )""")
    ctes = ",\n    ".join(parts)
    return f"""
    WITH {ctes}
    SELECT cid, COUNT(*) AS n_members, CAST(SUM(dist) AS BIGINT) AS inertia,
           MIN(vec_id) AS rep_vec
    FROM best_final
    GROUP BY cid
    """
