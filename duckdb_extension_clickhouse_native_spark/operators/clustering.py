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


def kmeans_sql(
    dialect: str,
    k: int = 8,
    iters: int = 2,
    dim: int = 64,
    vecs_rel: str | None = None,
) -> str:
    """Per-cluster summary after ``iters`` Lloyd iterations:
    (cid, n_members, inertia, rep_vec). Inertia is the exact
    fixed-point sum of squared distances (BIGINT).

    ``vecs_rel``: name of a pre-materialized (vec_id, d, xf) relation.
    When given, the exploded-dims CTE is omitted and every stage reads
    that relation instead — the Spark path persists it once (Catalyst
    inlines CTEs, so the explode would otherwise recompute per
    consumer: cent0 + one assign/means per iteration + final)."""
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
    vecs = vecs_rel or "vecs"
    parts = []
    if vecs_rel is None:
        parts.append(f"vecs AS ({explode_dims})")
    parts += [
        f"""seeds AS (
      SELECT vec_id,
             ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS {s})), vec_id) - 1 AS cid
      FROM embeddings
    )""",
        f"""cent0 AS (
      SELECT s.cid, v.d, v.xf AS cf
      FROM seeds s JOIN {vecs} v ON s.vec_id = v.vec_id
      WHERE s.cid < {k}
    )""",
    ]
    for t in range(iters):
        parts.append(f"""assign{t} AS (
      SELECT {h_cent}v.vec_id, c.cid, SUM((v.xf - c.cf) * (v.xf - c.cf)) AS dist
      FROM {vecs} v JOIN cent{t} c ON v.d = c.d
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
      FROM best{t} b JOIN {vecs} v ON b.vec_id = v.vec_id
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
      FROM {vecs} v JOIN cent{iters} c ON v.d = c.d
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

def kmeans_spark_sql(k: int = 8, iters: int = 2, dim: int = 64) -> str:
    """The optimized Spark form of ``kmeans_sql`` — bit-identical
    output (same oracle), restructured the way ``pq_topk_spark_sql``
    was in r7, because the exploded-dims form's cost is structural:
    every assign stage there joins n x dim vector rows with k x dim
    centroid rows ON d — n x dim x k rows in flight (64x the vector
    count at the defaults) before the partial agg collapses them.

    Shape notes (and why each piece is what it is):

    * vectors stay ARRAYS (``kmeans_vecs_arr``: one fixed-point BIGINT
      array per vector, persisted by ``kmeans_query``); each assign is
      ONE BroadcastNestedLoopJoin against the k-row centroid relation
      (k=8 rows broadcast — the standard assign shape), with the
      squared distance an unrolled ``dim``-term whole-stage-codegen
      expression — n x k rows in flight, 64x fewer than exploded;
    * the winner is ``MIN(dist * k + cid)`` — (dist, cid) packed into
      one BIGINT (dist <= dim * (2 * SCALE)^2 ~= 2.6e14, so the pack
      fits with 2^16 headroom), keeping the aggregation buffer a
      PRIMITIVE so Spark uses vectorized HashAggregate with map-side
      partials; a ``min(struct(dist, cid))`` buffer would fall back to
      the much slower ObjectHashAggregate (measured ~1.5x whole-query).
      Unpacking: cid = pk % k, dist = pk DIV k. Ties resolve to the
      lowest cid, exactly the exploded form's ROW_NUMBER ORDER BY
      dist, cid;
    * means re-join the persisted array relation on vec_id (n-vs-n
      hash join) and update each dimension with the exact oracle
      expression FLOOR(CAST(SUM(element_at(xfa, j)) AS DOUBLE) /
      COUNT(*)) — 64 primitive SUM buffers, still vectorized. This
      join is cheaper than carrying the arrays through the assign
      aggregation (an array-typed ``any_value`` de-vectorizes it);
    * empty clusters keep their centroid via the k-row LEFT JOIN, as
      in the oracle.

    Scale: per iteration one broadcast join, one n-row primitive
    shuffle, one n-vs-n hash join, one k-row group — shuffle bytes
    proportional to vectors, never to vectors x dims x k."""
    dist = " + ".join(
        f"(element_at(v.xfa, {j}) - element_at(c.cfa, {j})) * "
        f"(element_at(v.xfa, {j}) - element_at(c.cfa, {j}))"
        for j in range(1, dim + 1)
    )
    means_terms = ", ".join(
        f"CAST(FLOOR(CAST(SUM(element_at(v.xfa, {j})) AS DOUBLE) / COUNT(*)) AS BIGINT)"
        for j in range(1, dim + 1)
    )
    parts = [
        """seeds AS (
      SELECT vec_id,
             ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS STRING)), vec_id) - 1 AS cid
      FROM embeddings
    )""",
        f"""cent0 AS (
      SELECT s.cid, v.xfa AS cfa
      FROM seeds s JOIN kmeans_vecs_arr v ON s.vec_id = v.vec_id
      WHERE s.cid < {k}
    )""",
    ]
    for t in range(iters):
        parts.append(f"""assign{t} AS (
      SELECT /*+ BROADCAST(c) */ v.vec_id,
             MIN(({dist}) * {k} + c.cid) AS pk
      FROM kmeans_vecs_arr v CROSS JOIN cent{t} c
      GROUP BY v.vec_id
    )""")
        # SHUFFLE_HASH, not broadcast: at real scale the assignment is
        # n rows (never broadcastable) — hash-join both sides on vec_id
        # and skip the sort-merge sorts Catalyst's missing CTE stats
        # would otherwise pick
        parts.append(f"""means{t} AS (
      SELECT /*+ SHUFFLE_HASH(a) */ a.pk % {k} AS cid, array({means_terms}) AS cfa
      FROM assign{t} a JOIN kmeans_vecs_arr v ON a.vec_id = v.vec_id
      GROUP BY a.pk % {k}
    )""")
        parts.append(f"""cent{t + 1} AS (
      SELECT /*+ BROADCAST(n) */ o.cid, COALESCE(n.cfa, o.cfa) AS cfa
      FROM cent{t} o LEFT JOIN means{t} n ON o.cid = n.cid
    )""")
    parts.append(f"""assign_final AS (
      SELECT /*+ BROADCAST(c) */ v.vec_id,
             MIN(({dist}) * {k} + c.cid) AS pk
      FROM kmeans_vecs_arr v CROSS JOIN cent{iters} c
      GROUP BY v.vec_id
    )""")
    ctes = ",\n    ".join(parts)
    return f"""
    WITH {ctes}
    SELECT CAST(pk % {k} AS INT) AS cid, COUNT(*) AS n_members,
           CAST(SUM(pk DIV {k}) AS BIGINT) AS inertia,
           MIN(vec_id) AS rep_vec
    FROM assign_final
    GROUP BY pk % {k}
    """


def kmeans_query(spark, sf_dir: str, k: int = 8, iters: int = 2, dim: int = 64):
    """Spark path for ``kmeans_embeddings``: the restructured array
    form (``kmeans_spark_sql`` — no dim-explode, broadcast k-row
    centroid joins, unrolled codegen distances). The fixed-point
    (vec_id, xfa) relation is persisted once: it feeds cent0 plus the
    per-iteration and final assigns (4 consumers at iters=2), and
    Catalyst's CTE inlining would re-run the scan + transform for
    each. It is ~(8 + 8*dim) bytes per vector — the exploded form's
    working set, minus the per-dim row overhead."""
    from ..plans.base import load_tables, track_persist

    load_tables(spark, sf_dir, ["embeddings"])
    vecs = spark.sql(
        "SELECT vec_id, transform(embedding, v -> "
        f"CAST(FLOOR(CAST(v AS DOUBLE) * {SCALE}) AS BIGINT)) AS xfa "
        "FROM embeddings"
    )
    track_persist(vecs)
    vecs.createOrReplaceTempView("kmeans_vecs_arr")
    return spark.sql(kmeans_spark_sql(k=k, iters=iters, dim=dim))


def kmeans_fast(spark, sf_dir: str, k: int = 8, iters: int = 2, dim: int = 64):
    """The PRODUCTION shape of ``kmeans_sql``, bit-identical result.

    Same fixed-point semantics (floor-1e-6 coordinates, exact BIGINT
    distances, FLOOR(double-division) centroid updates, md5 seeds) but
    the n x k distance computation runs as numpy int64 matrix ops
    against a broadcast centroid array inside ``mapInPandas`` — the
    swap the SQL form's docstring promises for real scale:

    * per iteration the cluster shuffle carries k x dim PARTIAL-SUM
      rows per input batch (a few KB), not k rows per vector — at
      10^10 vectors the SQL form shuffles 8 x 10^10 rows per
      iteration, this shuffles ~10^6;
    * the centroid matrix (k x dim int64, ~4 KB at the defaults) ships
      in the UDF closure — the broadcast-variable pattern at real k;
    * the only driver-side data are the k x dim centroid updates per
      iteration (legitimate iterative control, like the CC loop).

    Registered with the SAME DuckDB oracle as ``kmeans_embeddings``:
    the driver's hash-compare proves the fast path exact, not just
    close."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from ..plans.base import load_tables

    t = load_tables(spark, sf_dir, ["embeddings"])
    emb = t["embeddings"].select("vec_id", "embedding")

    def to_fixed(mat: "np.ndarray") -> "np.ndarray":
        # xf = FLOOR(CAST(v AS DOUBLE) * SCALE): float32 -> float64 is
        # exact, the multiply rounds identically to both engines' double
        return np.floor(mat.astype(np.float64) * SCALE).astype(np.int64)

    # seeds: the k smallest md5(vec_id) — the same expression as the SQL
    # form, evaluated once (k rows collected)
    seed_ids = [
        r.vec_id
        for r in spark.sql(
            f"""
            SELECT vec_id FROM (
              SELECT vec_id,
                     ROW_NUMBER() OVER (
                       ORDER BY md5(CAST(vec_id AS STRING)), vec_id) - 1 AS cid
              FROM embeddings
            ) WHERE cid < {k} ORDER BY cid
            """
        ).collect()
    ]
    seed_vecs = {
        r.vec_id: r.embedding
        for r in emb.filter(F.col("vec_id").isin(seed_ids)).collect()
    }
    cent = np.stack(
        [to_fixed(np.asarray(seed_vecs[v], dtype=np.float32)) for v in seed_ids]
    )  # (k, dim) int64

    def dists_to(X: "np.ndarray", C: "np.ndarray") -> "np.ndarray":
        # exact int64 squared distances, (n, k); ties resolve to the
        # lowest cid via argmin's first-minimum rule (== ORDER BY dist, cid)
        diff = X[:, None, :] - C[None, :, :]
        return np.einsum("nkd,nkd->nk", diff, diff)

    for _ in range(iters):
        C = cent

        def partials(batches, C=C, k=k, dim=dim):
            for pdf in batches:
                if pdf.empty:
                    continue
                X = to_fixed(np.stack(list(pdf["embedding"])))
                best = np.argmin(dists_to(X, C), axis=1)
                cids, cnts, sums = [], [], []
                for cid in range(k):
                    mask = best == cid
                    n = int(mask.sum())
                    if not n:
                        continue
                    cids.append(cid)
                    cnts.append(n)
                    sums.append(X[mask].sum(axis=0).tolist())
                yield pd.DataFrame({"cid": cids, "cnt": cnts, "sums": sums})

        # combine batch partials engine-side; centroid update uses the
        # exact SQL expression (FLOOR of the exact double division)
        rows = (
            emb.mapInPandas(partials, "cid int, cnt bigint, sums array<bigint>")
            .select("cid", "cnt", F.posexplode("sums").alias("d", "s"))
            .groupBy("cid", "d")
            .agg(F.sum("s").alias("ssum"), F.sum("cnt").alias("n"))
            .withColumn(
                "cf", F.expr("CAST(FLOOR(CAST(ssum AS DOUBLE) / n) AS BIGINT)")
            )
            .select("cid", "d", "cf")
            .collect()
        )
        nxt = cent.copy()  # clusters with no members keep their centroid
        for r in rows:
            nxt[r.cid, r.d] = r.cf
        cent = nxt

    C = cent

    def assign(batches, C=C):
        for pdf in batches:
            if pdf.empty:
                continue
            X = to_fixed(np.stack(list(pdf["embedding"])))
            d = dists_to(X, C)
            best = np.argmin(d, axis=1)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "cid": best.astype(np.int32),
                    "dist": d[np.arange(len(best)), best],
                }
            )

    final = emb.mapInPandas(assign, "vec_id bigint, cid int, dist bigint")
    return final.groupBy("cid").agg(
        F.count("*").alias("n_members"),
        F.sum("dist").cast("bigint").alias("inertia"),
        F.min("vec_id").alias("rep_vec"),
    )
