"""Sketch-style operators: heavy hitters (ClickHouse ``topK``-shaped)
and per-source frequency capping.

``heavy_hitters_query`` — the ClickHouse ``topK``/space-saving use
case, built as the two-phase shape that is exact AND scale-safe:
(1) a CANDIDATE stage bounds memory like a Misra-Gries summary — each
Arrow batch emits only the items whose batch-local frequency exceeds
``1/(m+1)`` of the batch (pigeonhole: any item with GLOBAL frequency
> n/(m+1) must clear that bar in at least one batch, so the union of
batch candidates is a guaranteed superset of every true heavy hitter;
each batch contributes at most m+1 rows no matter how many distinct
keys exist); (2) an EXACT verify stage semi-joins events to the
(small, broadcastable) candidate set and recounts precisely, so the
output is the exact heavy-hitter list — the approximation only ever
prunes work, never changes the answer. At 100 TB the candidate set is
bounded by m x #batches while a full GROUP BY user would shuffle every
distinct key; the verify shuffle only carries candidate rows.

The reference engine exposes no aggregate surface of its own
(SURVEY.md §2.1 — it delegates to the host); this operator is
pipeline-tier, patterned on the ClickHouse ``topK`` aggregate's role.

``domain_cap_sql`` — CommonCrawl-style per-source frequency cap: keep
at most ``cap`` documents per source, chosen by a deterministic md5
priority so both engines (and any two cluster runs) keep the same
docs. One window per source; at real scale source cardinality is
large (domains), so the partition-by key is high-cardinality and the
window is balanced — for few-giant-domain corpora, swap in the
two-phase distributed-rank used by ``operators/sharding.py`` (same
output contract).
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, SparkSession

M_COUNTERS = 200       # candidate-stage capacity (per batch)
PHI_DEN = 130          # heavy hitter = count * PHI_DEN >= total_events


def _check_exactness_bound(m: int, phi_den: int) -> None:
    """The candidate stage only guarantees a SUPERSET of the true
    heavy hitters when the report threshold (total/phi_den) exceeds
    the candidate bound (total/(m+1)), i.e. phi_den <= m. With
    phi_den > m a true heavy hitter can be silently dropped before the
    exact recount ever sees it (ADVICE r8)."""
    if phi_den > m:
        raise ValueError(
            f"phi_den ({phi_den}) must be <= m ({m}): the bounded "
            "candidate stage keeps keys above total/(m+1), so a "
            "threshold below that (phi_den > m) loses exactness"
        )


def heavy_hitter_candidates(df: DataFrame, key: str, m: int = M_COUNTERS) -> DataFrame:
    """Candidate user ids via the batch-local frequency filter
    (Misra-Gries-style bound: <= m+1 candidates per Arrow batch)."""
    import pandas as pd

    def cands(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            vc = pdf[key].value_counts()
            keep = vc[vc * (m + 1) > len(pdf)]
            yield pd.DataFrame({key: keep.index})

    return df.select(key).mapInPandas(cands, schema=f"{key} bigint").distinct()


def heavy_hitters_query(
    spark: SparkSession, sf_dir: str, m: int = M_COUNTERS, phi_den: int = PHI_DEN
) -> DataFrame:
    """Exact heavy hitters over events: users with at least
    total/phi_den events, found via the bounded candidate stage and
    an exact verify recount (broadcast semi-join)."""
    from pyspark.sql import functions as F

    from ..plans.base import load_tables

    _check_exactness_bound(m, phi_den)

    load_tables(spark, sf_dir, ["events"])
    events = spark.table("events")
    cands = heavy_hitter_candidates(events, "user_id", m)
    exact = (
        events.join(F.broadcast(cands), "user_id", "left_semi")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_events"))
    )
    # total as a broadcast 1-row relation: ONE declarative plan, no
    # driver-side collect
    total = events.agg(F.count("*").alias("total_events"))
    return (
        exact.crossJoin(F.broadcast(total))
        .where(F.col("n_events") * phi_den >= F.col("total_events"))
        .orderBy("user_id")
        .select("user_id", "n_events")
    )


def heavy_hitters_oracle_sql(phi_den: int = PHI_DEN) -> str:
    return f"""
    SELECT user_id, COUNT(*) AS n_events
    FROM events
    GROUP BY user_id
    HAVING COUNT(*) * {phi_den} >= (SELECT COUNT(*) FROM events)
    ORDER BY user_id
    """


def domain_cap_sql(dialect: str, cap: int = 10) -> str:
    s = "STRING" if dialect == "spark" else "VARCHAR"
    return f"""
    WITH ranked AS (
      SELECT doc_id, source,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS {s})), doc_id
             ) AS rk
      FROM documents
    )
    SELECT doc_id, source, CAST(rk AS BIGINT) AS rk
    FROM ranked
    WHERE rk <= {cap}
    ORDER BY source, rk
    """


def weighted_candidates(df: DataFrame, key: str, weight: str, m: int = M_COUNTERS) -> DataFrame:
    """Weighted candidate keys: a key whose batch-local WEIGHT share
    exceeds 1/(m+1) — the same pigeonhole as the count form (total
    weight replaces row count), so any key with a global weight share
    > 1/(m+1) appears in at least one batch's candidates. REQUIRES
    non-negative weights (events.value is, per dq_audit_checks):
    negative weights break the pigeonhole in both directions."""
    import pandas as pd

    def cands(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            w = pdf.groupby(key)[weight].sum()
            tot = float(pdf[weight].sum())
            keep = w[w * (m + 1) > tot] if tot > 0 else w[w > 0]
            yield pd.DataFrame({key: keep.index})

    return df.select(key, weight).mapInPandas(
        cands, schema=f"{key} bigint"
    ).distinct()


def heavy_hitters_weighted_query(
    spark: SparkSession, sf_dir: str, m: int = M_COUNTERS, phi_den: int = PHI_DEN
) -> DataFrame:
    """ClickHouse ``topKWeighted`` role, exact: users holding at least
    total/phi_den of the summed event VALUE, via the weighted bounded
    candidate stage + an exact DECIMAL recount (broadcast semi-join).
    The weight sums go through DECIMAL(18,4) so the threshold compare
    is exact integer arithmetic in both engines."""
    from pyspark.sql import functions as F

    from ..plans.base import load_tables

    _check_exactness_bound(m, phi_den)

    load_tables(spark, sf_dir, ["events"])
    events = spark.table("events")
    cands = weighted_candidates(events, "user_id", "value", m)
    dec = F.col("value").cast("decimal(18,4)")
    exact = (
        events.join(F.broadcast(cands), "user_id", "left_semi")
        .groupBy("user_id")
        .agg(F.sum(dec).alias("w"))
    )
    total = events.agg(F.sum(dec).alias("total_w"))
    return (
        exact.crossJoin(F.broadcast(total))
        .where(F.col("w") * phi_den >= F.col("total_w"))
        .orderBy("user_id")
        .select("user_id", F.col("w").cast("double").alias("sum_value"))
    )


def heavy_hitters_weighted_oracle_sql(phi_den: int = PHI_DEN) -> str:
    return f"""
    SELECT user_id,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY user_id
    HAVING SUM(CAST(value AS DECIMAL(18,4))) * {phi_den} >=
           (SELECT SUM(CAST(value AS DECIMAL(18,4))) FROM events)
    ORDER BY user_id
    """
