"""Round-13 compatibility tranche: measured-recall evidence for the
compressed retrieval tiers (VERDICT r12 item 8).

``sim_int8_recall`` (r9) and ``sim_binary_recall`` (r12) grade the
int8 and 1-bit indexes against the exact ranking; the matryoshka
prefix tiers and the binary->exact cascade carried only top-k parity
entries until now.  These two entries close the family:

* ``sim_matryoshka_recall`` — recall@10 of the 16- and 32-dim prefix
  rankings vs the exact full-64-dim cosine top-10 (the measured
  truncation-loss curve an MRL deployment reads before picking a
  serving dim).
* ``sim_cascade_recall`` — end-to-end recall@10 of the full cascade
  (Hamming-top-100 shortlist -> exact fixed-point dot re-rank) over
  its 5 query vectors, against BOTH references: the exact same-metric
  dot ranking (isolates shortlist loss — the only loss the cascade
  can introduce) and the exact cosine ranking (the user-facing
  metric).  All arithmetic is exact-integer or ROUND-guarded, so both
  engines hash-match.
"""

from __future__ import annotations

from .base import REGISTRY
from .compat_r12b import _cascade_sql


def _sql_pair(name, spark_sql, duck_sql, tables, tags, description) -> None:
    REGISTRY.sql_query(
        name, spark_sql, oracle=duck_sql, tables=tables, tags=tags,
        description=description,
    )


# --- matryoshka recall curve --------------------------------------------------
def _matryoshka_recall_sql(dialect: str) -> str:
    from ..operators.similarity import cosine_topk_sql

    m16 = cosine_topk_sql(dialect, dim=16)
    m32 = cosine_topk_sql(dialect, dim=32)
    f64 = cosine_topk_sql(dialect)
    return f"""
    SELECT
      CAST((SELECT COUNT(*) FROM ({m16}) p JOIN ({f64}) e
            ON p.vec_id = e.vec_id) AS INT) AS hits_16d_at_10,
      CAST((SELECT COUNT(*) FROM ({m32}) p JOIN ({f64}) e
            ON p.vec_id = e.vec_id) AS INT) AS hits_32d_at_10,
      CAST(10 AS INT) AS k
    """


_sql_pair(
    "sim_matryoshka_recall",
    _matryoshka_recall_sql("spark"),
    _matryoshka_recall_sql("duckdb"),
    ["embeddings"],
    ["similarity", "matryoshka", "evaluation"],
    "recall@10 of the 16- and 32-dim matryoshka prefixes vs the exact "
    "full-dim cosine top-10 (the truncation-loss curve; "
    "sim_int8_recall / sim_binary_recall precedent)",
)


# --- cascade end-to-end recall --------------------------------------------------
def _cascade_recall_sql(engine: str) -> str:
    # exact references share the cascade's e6 quantization; the dot
    # reference isolates shortlist loss (same metric as the re-rank),
    # the cosine reference is the user-facing quality number.  ||q|| is
    # constant within a query partition, so cosine ranking reduces to
    # dot / ||candidate|| — ROUND(12) guards the one IEEE division.
    if engine == "spark":
        e6 = (
            "SELECT vec_id, transform(embedding, "
            "x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS e6 "
            "FROM embeddings"
        )
        dot = (
            "aggregate(zip_with(q.e6, c.e6, (a, b) -> a * b), "
            "CAST(0 AS BIGINT), (acc, x) -> acc + x)"
        )
        nc = (
            "aggregate(zip_with(c.e6, c.e6, (a, b) -> a * b), "
            "CAST(0 AS BIGINT), (acc, x) -> acc + x)"
        )
    else:
        e6 = (
            "SELECT vec_id, list_transform(embedding, "
            "x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS e6 "
            "FROM embeddings"
        )
        dot = "list_sum(list_transform(range(64), i -> q.e6[i + 1] * c.e6[i + 1]))"
        nc = "list_sum(list_transform(range(64), i -> c.e6[i + 1] * c.e6[i + 1]))"
    casc = _cascade_sql(engine)
    return f"""
    WITH casc AS (SELECT query_id, cand_id FROM ({casc})),
    e AS ({e6}),
    qs AS (SELECT vec_id AS query_id, e6 FROM e WHERE vec_id < 5),
    scored AS (
      SELECT q.query_id, c.vec_id AS cand_id,
             CAST({dot} AS BIGINT) AS dot,
             CAST({nc} AS BIGINT) AS n2
      FROM qs q JOIN e c ON c.vec_id <> q.query_id
    ),
    exact_dot AS (
      SELECT query_id, cand_id FROM (
        SELECT query_id, cand_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY dot DESC, cand_id) AS rk
        FROM scored
      ) r WHERE rk <= 10
    ),
    exact_cos AS (
      SELECT query_id, cand_id FROM (
        SELECT query_id, cand_id,
               ROW_NUMBER() OVER (
                 PARTITION BY query_id
                 ORDER BY ROUND(CAST(dot AS DOUBLE) / sqrt(CAST(n2 AS DOUBLE)),
                                12) DESC, cand_id) AS rk
        FROM scored
      ) r WHERE rk <= 10
    )
    SELECT
      CAST((SELECT COUNT(*) FROM casc c JOIN exact_dot e
            ON c.query_id = e.query_id AND c.cand_id = e.cand_id) AS INT)
        AS dot_hits_at_10,
      CAST((SELECT COUNT(*) FROM casc c JOIN exact_cos e
            ON c.query_id = e.query_id AND c.cand_id = e.cand_id) AS INT)
        AS cos_hits_at_10,
      CAST(50 AS INT) AS total
    """


_sql_pair(
    "sim_cascade_recall",
    _cascade_recall_sql("spark"),
    _cascade_recall_sql("duck"),
    ["embeddings"],
    ["similarity", "binary", "cascade", "evaluation"],
    "end-to-end recall@10 of the Hamming->exact-dot cascade over its "
    "5 queries vs exact same-metric dot top-10 (shortlist loss only) "
    "AND exact cosine top-10 (user-facing metric)",
)
