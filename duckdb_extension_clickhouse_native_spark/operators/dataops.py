"""Pipeline data operations: dbt-style data-quality audits and
MERGE-style CDC upserts — the maintenance queries that run around an
analytics engine in production, expressed as plain relational algebra
so they need no lakehouse extension.

``dq_audit_sql`` — a battery of declarative checks (referential
integrity, key uniqueness, accepted values, range/sign bounds) each
reduced to a violation count; one row per check. Every check is an
independent aggregation over one table (the referential one is an
anti-join keyed on the foreign key) — at 100 TB they run as one pass
per table with map-side combine, and the union is rows-of-scalars.

``merge_upsert_sql`` — MERGE INTO semantics (update matched, insert
new, keep the rest) as one FULL OUTER JOIN between the base table and
a CDC delta, labeling every output row with its merge action. Spark
without a lakehouse format lacks MERGE; this is the canonical
re-expression (one shuffle on the merge key; the delta side is
broadcast-size in the common case). The simulated delta (every 7th
customer re-balanced + 50 new arrivals) is deterministic, so the
oracle reproduces it exactly.
"""

from __future__ import annotations


def dq_audit_sql(dialect: str) -> str:
    return """
    WITH checks AS (
      SELECT 'orders_custkey_referential' AS check_name,
             COUNT(*) AS n_violations
      FROM orders o
      WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
      UNION ALL
      SELECT 'orders_orderkey_unique',
             CAST(COALESCE(SUM(cnt - 1), 0) AS BIGINT)
      FROM (SELECT o_orderkey, COUNT(*) AS cnt FROM orders GROUP BY o_orderkey) d
      WHERE cnt > 1
      UNION ALL
      SELECT 'orders_priority_accepted_values',
             COUNT(*)
      FROM orders
      WHERE o_orderpriority NOT IN
            ('1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW')
      UNION ALL
      SELECT 'events_value_non_negative', COUNT(*) FROM events WHERE value < 0
      UNION ALL
      SELECT 'events_value_above_99', COUNT(*) FROM events WHERE value > 99.0
      UNION ALL
      SELECT 'events_ts_in_range', COUNT(*)
      FROM events
      WHERE CAST(ts AS TIMESTAMP) < TIMESTAMP '2020-01-01 00:00:00'
         OR CAST(ts AS TIMESTAMP) > TIMESTAMP '2030-01-01 00:00:00'
      UNION ALL
      SELECT 'customer_acctbal_not_null', COUNT(*) FROM customer
      WHERE c_acctbal IS NULL
    )
    SELECT check_name, n_violations,
           CAST(CASE WHEN n_violations = 0 THEN 1 ELSE 0 END AS INT) AS passed
    FROM checks
    ORDER BY check_name
    """


def merge_upsert_sql(dialect: str) -> str:
    # fabricated "inserted" keys start ABOVE MAX(c_custkey) (scalar
    # CTE, one row, broadcast for free) — a hard-coded base would
    # collide with real keys at scale factors past it, duplicating
    # base rows through the FULL OUTER JOIN
    idx = "id" if dialect == "spark" else "range"
    new_rows = (
        f"SELECT CAST(mx.m + 1 + {idx} AS BIGINT) AS c_custkey, 'new' AS c_name, "
        f"CAST({idx} % 25 AS BIGINT) AS c_nationkey, "
        "CAST(0 AS DOUBLE) AS c_acctbal, 'BUILDING' AS c_mktsegment "
        "FROM range(50) CROSS JOIN mx"
    )
    return f"""
    WITH mx AS (SELECT MAX(c_custkey) AS m FROM customer),
    delta AS (
      SELECT c_custkey, c_name, c_nationkey,
             CAST(c_acctbal AS DOUBLE) + 1000.0 AS c_acctbal, c_mktsegment
      FROM customer WHERE c_custkey % 7 = 0
      UNION ALL
      {new_rows}
    )
    SELECT COALESCE(d.c_custkey, b.c_custkey) AS c_custkey,
           COALESCE(d.c_name, b.c_name) AS c_name,
           COALESCE(d.c_nationkey, b.c_nationkey) AS c_nationkey,
           CAST(COALESCE(d.c_acctbal, CAST(b.c_acctbal AS DOUBLE)) AS DOUBLE)
             AS c_acctbal,
           COALESCE(d.c_mktsegment, b.c_mktsegment) AS c_mktsegment,
           CASE WHEN d.c_custkey IS NOT NULL AND b.c_custkey IS NOT NULL
                     THEN 'updated'
                WHEN d.c_custkey IS NOT NULL THEN 'inserted'
                ELSE 'unchanged' END AS merge_action
    FROM customer b
    FULL OUTER JOIN delta d ON b.c_custkey = d.c_custkey
    ORDER BY c_custkey
    """
