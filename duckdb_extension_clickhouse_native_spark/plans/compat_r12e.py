"""Round-12 fifth compatibility tranche: WITH TIES, running
concurrency, array rotation/shingling, and time slots.

* ``LIMIT n WITH TIES`` (docs: statements/select/limit) — rows tied
  with the last in-limit ORDER BY value are kept.  Spark has no WITH
  TIES; the engine form is the standard ``rank() <= n`` lowering.
  The DuckDB oracle uses the literal ``LIMIT n WITH TIES`` clause —
  maximally independent machinery on each side.
* ``runningConcurrency(begin, end)`` (docs:
  aggregate-functions/reference — also the classic interval-overlap
  sweep) — for each event interval, how many intervals are open at
  its start.  The scale plan is the marker sweep: +1 at begin, -1 at
  end, partition-keyed cumulative sum — never an O(n^2) self-join.
  Intervals derive deterministically from events (begin = ts,
  end = ts + (1 + value-cents mod 600) seconds).
* ``arrayRotate`` / ``arrayShingles`` (docs: array-functions) —
  rotation via two slices; shingles as overlapping windows.  Arrays
  render to CSV/pipe strings (driver-hashable).  Spark
  slice/transform/sequence vs DuckDB list slicing + generate_series —
  independent list machinery.
* ``timeSlots(start, duration, size)`` (docs:
  date-time-functions#timeslots) — the slot grid each event's
  [start, start+duration] span touches, at 300 s granularity: every
  slot boundary from floor(start/size)*size to start+duration.
  Spark ``sequence()`` over epochs vs DuckDB ``generate_series`` —
  then exploded and aggregated so the graded output is scalar.

Determinism rules follow base.py: integer cents/epochs end to end,
CSV-serialized arrays, no ROUND anywhere (every output exact).
"""

from __future__ import annotations

from .base import REGISTRY

# --- LIMIT n WITH TIES ----------------------------------------------------------
# Ten cheapest parts by retail cents; ties on the boundary cents value
# all survive. rank() (not row_number) is exactly the WITH TIES rule.
_WITH_TIES_SPARK = """
    SELECT p_partkey, cents FROM (
      SELECT p_partkey,
             CAST(FLOOR(p_retailprice * 100) AS BIGINT) % 977 AS cents,
             RANK() OVER (
               ORDER BY CAST(FLOOR(p_retailprice * 100) AS BIGINT) % 977
             ) AS r
      FROM part
    )
    WHERE r <= 10
    ORDER BY cents, p_partkey
"""

# DuckDB 1.0 has no WITH TIES clause; the oracle's independent
# formulation is the boundary-value subquery: keep every row whose
# key <= the 10th-smallest key (identical to the WITH TIES contract).
# COALESCE guard: on a relation with <10 rows the OFFSET subquery is
# NULL — fall back to the max key so BOTH sides return all rows
# (rank()<=10 keeps everything), instead of the oracle returning zero.
_WITH_TIES_ORACLE = """
    WITH t AS (
      SELECT p_partkey,
             CAST(FLOOR(p_retailprice * 100) AS BIGINT) % 977 AS cents
      FROM part
    )
    SELECT p_partkey, cents FROM t
    WHERE cents <= COALESCE(
      (SELECT cents FROM t ORDER BY cents LIMIT 1 OFFSET 9),
      (SELECT MAX(cents) FROM t)
    )
    ORDER BY cents, p_partkey
"""

REGISTRY.sql_query(
    "topk_with_ties",
    _WITH_TIES_SPARK,
    oracle=_WITH_TIES_ORACLE,
    tables=["part"],
    tags=["compat", "topk", "window"],
    description=(
        "ClickHouse LIMIT 10 WITH TIES: rank()<=n lowering on the "
        "Spark side vs DuckDB's literal WITH TIES clause (the %977 "
        "fold manufactures real boundary ties)"
    ),
)


# --- runningConcurrency -----------------------------------------------------------
# Marker sweep: +1 at each begin, -1 at each end, ordered cumulative
# sum; concurrency AT a begin counts intervals with begin <= b < end
# (ends sort before begins at the same instant — the half-open
# [begin, end) convention). One window over the 2n marker rows.
_RUNNING_CONC_SPARK = """
    WITH iv AS (
      SELECT event_id,
             CAST(unix_timestamp(ts) AS BIGINT) AS b,
             CAST(unix_timestamp(ts) AS BIGINT)
               + 1 + CAST(FLOOR(value * 100) AS BIGINT) % 600 AS e
      FROM events
      WHERE event_type IN ('click', 'view')
    ),
    markers AS (
      SELECT b AS t, 1 AS kind, 1 AS delta, event_id FROM iv
      UNION ALL
      SELECT e AS t, 0 AS kind, -1 AS delta, NULL AS event_id FROM iv
    ),
    swept AS (
      SELECT t, kind, event_id,
             SUM(delta) OVER (
               ORDER BY t, kind, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS conc
      FROM markers
    )
    SELECT CAST(MAX(conc) AS BIGINT) AS peak_concurrency,
           CAST(SUM(CASE WHEN kind = 1 THEN conc ELSE 0 END) AS BIGINT)
             AS sum_at_starts,
           CAST(SUM(kind) AS BIGINT) AS n_intervals
    FROM swept
"""

REGISTRY.sql_query(
    "events_running_concurrency",
    _RUNNING_CONC_SPARK,
    # FLOOR before the cast: DuckDB CAST(double AS BIGINT) rounds,
    # Spark unix_timestamp truncates (the scalar_time_slots ±1 s trap)
    oracle=_RUNNING_CONC_SPARK.replace(
        "unix_timestamp(ts)", "FLOOR(epoch(CAST(ts AS TIMESTAMP)))"
    ),
    tables=["events"],
    tags=["compat", "events", "intervals", "window"],
    description=(
        "ClickHouse runningConcurrency: +1/-1 marker sweep with one "
        "ordered cumulative sum (never the O(n^2) overlap self-join); "
        "peak + per-start concurrency fingerprints, exact integers"
    ),
)


# --- arrayRotate / arrayShingles ---------------------------------------------------
_ROTATE_SPARK = """
    WITH arr AS (
      SELECT l_orderkey, l_linenumber,
             array(CAST(l_linenumber AS BIGINT),
                   CAST(FLOOR(l_quantity) AS BIGINT),
                   l_partkey % 9,
                   l_suppkey % 9,
                   (l_partkey + l_suppkey) % 9) AS a
      FROM lineitem
      WHERE l_orderkey % 151 = 0
    )
    SELECT l_orderkey, l_linenumber,
           array_join(transform(concat(slice(a, 3, 3), slice(a, 1, 2)),
             x -> CAST(x AS STRING)), ',') AS rotated2,
           array_join(transform(sequence(1, 3),
             i -> array_join(transform(slice(a, i, 3),
               x -> CAST(x AS STRING)), ',')), '|') AS shingles3
    FROM arr
    ORDER BY l_orderkey, l_linenumber
"""

_ROTATE_ORACLE = """
    WITH arr AS (
      SELECT l_orderkey, l_linenumber,
             [CAST(l_linenumber AS BIGINT),
              CAST(FLOOR(l_quantity) AS BIGINT),
              l_partkey % 9,
              l_suppkey % 9,
              (l_partkey + l_suppkey) % 9] AS a
      FROM lineitem
      WHERE l_orderkey % 151 = 0
    )
    SELECT l_orderkey, l_linenumber,
           array_to_string(a[3:5] || a[1:2], ',') AS rotated2,
           array_to_string(
             [array_to_string(a[i:i+2], ',')
              FOR i IN generate_series(1, 3)], '|') AS shingles3
    FROM arr
    ORDER BY l_orderkey, l_linenumber
"""

REGISTRY.sql_query(
    "array_rotate_shingles",
    _ROTATE_SPARK,
    oracle=_ROTATE_ORACLE,
    tables=["lineitem"],
    tags=["compat", "array"],
    description=(
        "ClickHouse arrayRotate(a, 2) + arrayShingles(a, 3): two-slice "
        "rotation and overlapping windows; Spark slice/sequence vs "
        "DuckDB list slicing + comprehension, CSV/pipe-rendered"
    ),
)


# --- timeSlots --------------------------------------------------------------------
# Slot grid at 300 s: every boundary from floor(b/300)*300 through
# b+duration. Exploded, then aggregated to scalar fingerprints (slot
# count, distinct slots, min/max slot) so the graded output is flat.
_TIME_SLOTS_SPARK = """
    WITH iv AS (
      SELECT event_id,
             CAST(unix_timestamp(ts) AS BIGINT) AS b,
             1 + CAST(FLOOR(value * 100) AS BIGINT) % 900 AS dur
      FROM events
      WHERE event_type = 'purchase'
    ),
    slots AS (
      SELECT event_id,
             explode(sequence(
               CAST(FLOOR(b / 300) * 300 AS BIGINT),
               b + dur,
               CAST(300 AS BIGINT)
             )) AS slot
      FROM iv
    )
    SELECT COUNT(*) AS n_slot_rows,
           COUNT(DISTINCT slot) AS n_distinct_slots,
           MIN(slot) AS min_slot,
           MAX(slot) AS max_slot
    FROM slots
"""

_TIME_SLOTS_ORACLE = """
    WITH iv AS (
      -- FLOOR before the cast: DuckDB CAST(double AS BIGINT) ROUNDS
      -- while Spark's unix_timestamp truncates — sub-second ts would
      -- shift b by 1 s on half the rows (caught by the sf0.01 sweep)
      SELECT event_id,
             CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS b,
             1 + CAST(FLOOR(value * 100) AS BIGINT) % 900 AS dur
      FROM events
      WHERE event_type = 'purchase'
    ),
    slots AS (
      SELECT event_id, unnest(generate_series(
               CAST(FLOOR(b / 300) * 300 AS BIGINT),
               b + dur,
               300
             )) AS slot
      FROM iv
    )
    SELECT COUNT(*) AS n_slot_rows,
           COUNT(DISTINCT slot) AS n_distinct_slots,
           MIN(slot) AS min_slot,
           MAX(slot) AS max_slot
    FROM slots
"""

REGISTRY.sql_query(
    "scalar_time_slots",
    _TIME_SLOTS_SPARK,
    oracle=_TIME_SLOTS_ORACLE,
    tables=["events"],
    tags=["compat", "scalar", "datetime"],
    description=(
        "ClickHouse timeSlots(start, duration, 300): the slot grid "
        "each span touches; Spark sequence()+explode vs DuckDB "
        "generate_series+unnest, exact epoch integers"
    ),
)
