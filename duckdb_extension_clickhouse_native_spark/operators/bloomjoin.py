"""Bloom-filter semi-join pre-filter — the runtime-filter technique a
100 TB join plan lives on: build a tiny bit-set from the small side's
join keys, broadcast it, and drop most non-matching fact rows BEFORE
the semi-join shuffle. Spark's AQE injects these automatically for
some shapes (InSubqueryExec runtime filters); this is the explicit,
engine-portable form, built entirely in relational algebra — the
bloom bitmap is a ~2048-row (word_idx, word) relation produced by a
bit_or aggregation (32 bits per BIGINT word — DuckDB checks overflow
on 1<<63, so shifts stay under the sign bit in both engines), no driver-side state, no UDFs.

Exactness: the bloom pass only REMOVES definite non-members (false
positives survive it), it probes at KEY level (fact-row multiplicity
is never touched — duplicate fact rows survive exactly), and an
exact semi-join runs after it — so the result equals the plain
semi-join row-for-row, which is precisely what the DuckDB oracle
computes. FPR with m=65536 bits / k=4 hashes
stays negligible for the selective segments used here; at 100 TB you
size m from the build-side count the same way.

Scale shape: build = one tiny aggregation (m/64 rows, broadcast);
probe = one distinct pass over the fact keys + a broadcast join +
a per-key hit count (map-side combinable); only surviving keys gate
the exact semi-join shuffle. The k hash positions reuse the md5 parity helper
(``_hex_int_expr``) so the same SQL runs on both engines if needed.
"""

from __future__ import annotations

M_BITS = 65_536
K_HASHES = 4


def _h(dialect: str, key_expr: str, i: int) -> str:
    from .dedup import DUCK, SPARK, _hex_int_expr

    d = SPARK if dialect == "spark" else DUCK
    s = d["string"]
    # double parens on purpose: the hash expr must be fully grouped
    # before % binds, on BOTH dialects (see _hex_int_expr's wrap note)
    expr = _hex_int_expr(d, f"md5(concat('b{i}#', CAST({key_expr} AS {s})))", nibbles=15)
    return f"(({expr}) % {M_BITS})"


def bloom_semijoin_sql(dialect: str) -> str:
    """Orders restricted to a selective customer segment, pre-filtered
    through the bloom relation then exactly semi-joined; aggregated by
    priority so the output is compact and hash-stable."""
    idiv = "DIV" if dialect == "spark" else "//"
    if dialect == "spark":
        expl = "LATERAL VIEW explode(array(0, 1, 2, 3)) t AS i"
        shl = "shiftleft(CAST(1 AS BIGINT), CAST({b} AS INT))"
    else:
        expl = ", UNNEST([0, 1, 2, 3]) AS t(i)"
        shl = "(CAST(1 AS BIGINT) << CAST({b} AS INT))"
    hashes_small = " ".join(
        f"WHEN i = {i} THEN {_h(dialect, 'c_custkey', i)}" for i in range(K_HASHES)
    )
    hashes_big = " ".join(
        f"WHEN i = {i} THEN {_h(dialect, 'o_custkey', i)}" for i in range(K_HASHES)
    )
    return f"""
    WITH small AS (
      SELECT c_custkey FROM customer
      WHERE c_mktsegment = 'AUTOMOBILE' AND c_nationkey < 5
    ),
    small_bits AS (
      SELECT CASE {hashes_small} END AS h
      FROM small {expl}
    ),
    bloom AS (
      SELECT h {idiv} 32 AS w,
             BIT_OR({shl.format(b='h % 32')}) AS word
      FROM small_bits GROUP BY h {idiv} 32
    ),
    probe_keys AS (SELECT DISTINCT o_custkey FROM orders),
    pk AS (
      SELECT o_custkey, CASE {hashes_big} END AS h
      FROM probe_keys {expl}
    ),
    cand_keys AS (
      -- probe at KEY level, not row level: fact-row multiplicity is
      -- preserved exactly (a row-level GROUP BY would collapse
      -- duplicate fact rows), and the bloom join touches |distinct
      -- keys| * k rows instead of |fact| * k
      SELECT o_custkey
      FROM pk p
      JOIN bloom b
        ON p.h {idiv} 32 = b.w
       AND (b.word & {shl.format(b='p.h % 32')}) != 0
      GROUP BY o_custkey
      HAVING COUNT(*) = {K_HASHES}
    )
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price
    FROM orders
    WHERE o_custkey IN (SELECT o_custkey FROM cand_keys)
      AND o_custkey IN (SELECT c_custkey FROM small)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """


BLOOM_SEMIJOIN_ORACLE = """
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price
    FROM orders
    WHERE o_custkey IN (
      SELECT c_custkey FROM customer
      WHERE c_mktsegment = 'AUTOMOBILE' AND c_nationkey < 5
    )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """
