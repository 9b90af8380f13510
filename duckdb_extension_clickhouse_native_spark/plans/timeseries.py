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

# auto-strategy decision cache, keyed by sf_dir (the asof
# _AUTO_DECISIONS precedent); one cheap stats job per dataset/session
_MAXINT_AUTO_DECISIONS: dict = {}

# the single-window form lands each event_type's FULL point set (2
# points per event) on one reducer.  local[32] probes carry 10x events
# at 2.1x cost, so the crossover is set where a single reducer's input
# stops being laptop-sized: past ~5M points per key the two-phase
# chunked form (64x keys + broadcast prefix offsets) takes over.
MAXINT_POINTS_PER_KEY_CROSSOVER = 5_000_000


def _max_intersections_query(spark, sf_dir: str, strategy: str = "auto"):
    """``events_max_intersections`` with a strategy switch (r9 verdict
    #5): ``window`` (single partitioned sweep — fastest below the
    crossover), ``twophase`` (skew-immune chunked scan), or ``auto`` —
    one COUNT/COUNT DISTINCT stats job estimates points-per-key and
    picks the form; decision cached per sf_dir."""
    from .base import load_tables

    t = load_tables(spark, sf_dir, ["events"])
    if strategy == "auto":
        if sf_dir not in _MAXINT_AUTO_DECISIONS:
            from pyspark.sql import functions as F

            row = t["events"].agg(
                F.count("*").alias("n"),
                F.countDistinct("event_type").alias("k"),
            ).collect()[0]
            pts_per_key = (2 * row["n"]) / max(1, row["k"])
            _MAXINT_AUTO_DECISIONS[sf_dir] = (
                "twophase"
                if pts_per_key >= MAXINT_POINTS_PER_KEY_CROSSOVER
                else "window"
            )
        strategy = _MAXINT_AUTO_DECISIONS[sf_dir]
    if strategy == "window":
        return spark.sql(_MAX_INTERSECTIONS_TEMPLATE.format(IV=_IV_SPARK))
    if strategy == "twophase":
        return spark.sql(
            _MAX_INTERSECTIONS_TWOPHASE_TEMPLATE.format(IV=_IV_SPARK)
        )
    raise ValueError(f"unknown strategy {strategy!r}")


# DEFAULT entry is strategy="auto"; both fixed strategies stay
# registered (window below, twophase above the crossover).
REGISTRY.df_query(
    "events_max_intersections",
    _max_intersections_query,
    oracle=_MAX_INTERSECTIONS_TEMPLATE.format(IV=_IV_DUCK),
    tags=["agg", "compat", "interval", "window"],
    description="ClickHouse maxIntersections(+Position): peak concurrent "
    "intervals per event_type via a +1/-1 sweep line (closed-open "
    "endpoints, integer-exact); strategy=auto picks the single-window "
    "form below ~5M points/key and the two-phase chunked form above",
)

REGISTRY.sql_query(
    "events_max_intersections_window",
    _MAX_INTERSECTIONS_TEMPLATE.format(IV=_IV_SPARK),
    oracle=_MAX_INTERSECTIONS_TEMPLATE.format(IV=_IV_DUCK),
    tables=["events"],
    tags=["agg", "compat", "interval", "window"],
    description="maxIntersections, fixed single-window sweep (auto's "
    "below-crossover pick; one partitioned window, no global sort)",
)

# The skew-immune form of the same sweep line: the single-window shape
# above partitions by event_type alone (5 keys in this corpus — at
# 100 TB each key's full point set lands on ONE reducer).  This variant
# runs the classic two-phase distributed scan instead: running sums
# within (event_type, time-chunk) partitions — 64x more keys, AQE
# -splittable — plus a tiny per-chunk-total prefix relation broadcast
# back to offset them.  Peak extraction avoids the 5-key unordered
# window too (grouped MAX + broadcast join-back).  Results are
# identical to the single-window form, and the ORACLE IS the
# single-window DuckDB SQL — the two algorithms check each other.
# (Probe: 10x events cost 2.1x on the single-window form at local[32];
# this form exists for the 1000-executor case, the
# dedup_substring_spans_twophase precedent.)
_MAX_INTERSECTIONS_TWOPHASE_TEMPLATE = """
    WITH iv AS ({IV}),
    pts AS (
      SELECT event_type, s AS t, 1 AS d FROM iv
      UNION ALL
      SELECT event_type, e AS t, -1 AS d FROM iv
    ),
    ext AS (
      SELECT MIN(t) AS tmin, MAX(t) AS tmax FROM pts
    ),
    ch AS (
      SELECT p.event_type, p.t, p.d,
             LEAST(63, CAST(FLOOR((p.t - ext.tmin) * 64.0
                                  / (ext.tmax - ext.tmin + 1)) AS INT))
               AS chunk
      FROM pts p CROSS JOIN ext
    ),
    within AS (
      SELECT event_type, chunk, t,
             SUM(d) OVER (
               PARTITION BY event_type, chunk ORDER BY t, d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS run_in
      FROM ch
    ),
    tot AS (
      SELECT event_type, chunk, CAST(SUM(d) AS BIGINT) AS ctot
      FROM ch
      GROUP BY event_type, chunk
    ),
    off AS (
      SELECT event_type, chunk,
             SUM(ctot) OVER (
               PARTITION BY event_type ORDER BY chunk
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS coff
      FROM tot
    ),
    cur AS (
      SELECT w.event_type, w.t,
             w.run_in + COALESCE(o.coff, 0) AS cur
      FROM within w
      JOIN off o
        ON w.event_type = o.event_type AND w.chunk = o.chunk
    ),
    m AS (
      SELECT event_type, CAST(MAX(cur) AS BIGINT) AS m
      FROM cur
      GROUP BY event_type
    )
    SELECT c.event_type,
           m.m AS max_intersections,
           MIN(CASE WHEN c.cur = m.m THEN c.t END) AS first_peak_us
    FROM cur c
    JOIN m ON c.event_type = m.event_type
    GROUP BY c.event_type, m.m
    ORDER BY c.event_type
"""

REGISTRY.sql_query(
    "events_max_intersections_twophase",
    _MAX_INTERSECTIONS_TWOPHASE_TEMPLATE.format(IV=_IV_SPARK),
    oracle=_MAX_INTERSECTIONS_TEMPLATE.format(IV=_IV_DUCK),
    tables=["events"],
    tags=["agg", "compat", "interval", "window", "skew"],
    description="maxIntersections, skew-immune two-phase scan: chunked "
    "running sums + broadcast prefix offsets (64x window keys, "
    "AQE-splittable); graded against the SINGLE-window oracle — two "
    "algorithms, one answer",
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

# groupArrayMovingSum(3): per-user moving sums over the ordered value
# stream, emitted in ClickHouse's array-per-group shape (serialized to
# CSV for grading — the r5 array-type driver trap).  The moving sum is
# one partitioned ROWS-frame window; the array serialization sorts a
# collected struct list on the same verified-unique key, so element
# order is pinned on both engines.
_MOVING_SUM_SPARK = """
    WITH ms AS (
      SELECT user_id, unix_micros(ts) AS tu, event_id,
             SUM(CAST(FLOOR(value * 100) AS BIGINT)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
             ) AS mv
      FROM events
    )
    SELECT user_id,
           array_join(
             transform(
               array_sort(collect_list(struct(tu, event_id, mv))),
               x -> CAST(x.mv AS STRING)),
             ',') AS moving_sums_cents,
           COUNT(*) AS n
    FROM ms
    GROUP BY user_id
    ORDER BY user_id
"""
_MOVING_SUM_DUCK = """
    WITH ms AS (
      SELECT user_id, event_id,
             CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
             ) AS BIGINT) AS mv,
             ts
      FROM events
    )
    SELECT user_id,
           string_agg(CAST(mv AS VARCHAR), ',' ORDER BY ts, event_id)
             AS moving_sums_cents,
           COUNT(*) AS n
    FROM ms
    GROUP BY user_id
    ORDER BY user_id
"""

REGISTRY.sql_query(
    "events_moving_sum",
    _MOVING_SUM_SPARK,
    oracle=_MOVING_SUM_DUCK,
    tables=["events"],
    tags=["agg", "compat", "window", "arrays"],
    description="ClickHouse groupArrayMovingSum(3): per-user ordered "
    "moving sums as the array-per-group shape (cents-exact, one "
    "partitioned window; serialized for grading)",
)

# exponentialMovingAverage, the dyadic-exact variant: half-per-step
# decay over the last 16 rows.  Weights are 2^(15-j) for lag j, so the
# numerator/denominator are exact BIGINTs (max ~ 5e4 cents * 2^16 —
# nowhere near overflow) and the quotient is emitted as an exact
# integer pair rather than a float.  16 LAG taps share one window
# spec -> a single partitioned window pass, no self-join blowup at any
# scale (the rn-difference join alternative goes quadratic per key).
_TAPS = 16


def _ema_terms(val_expr: str) -> tuple[str, str]:
    num = " + ".join(
        f"COALESCE(LAG({val_expr}, {j}) OVER w, 0) * {1 << (_TAPS - 1 - j)}"
        for j in range(_TAPS)
    )
    den = " + ".join(
        f"(CASE WHEN LAG({val_expr}, {j}) OVER w IS NULL THEN 0 "
        f"ELSE {1 << (_TAPS - 1 - j)} END)"
        for j in range(_TAPS)
    )
    return num, den


_EMA_NUM, _EMA_DEN = _ema_terms("vc")
_EMA_SQL = f"""
    SELECT user_id, event_id,
           CAST({_EMA_NUM} AS BIGINT) AS ema_num,
           CAST({_EMA_DEN} AS BIGINT) AS ema_den
    FROM (
      SELECT user_id, event_id, ts,
             CAST(FLOOR(value * 100) AS BIGINT) AS vc
      FROM events
    ) e
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ORDER BY user_id, event_id
"""

REGISTRY.sql_query(
    "events_exp_moving_avg",
    _EMA_SQL,
    oracle=_EMA_SQL,
    tables=["events"],
    tags=["window", "compat", "delta"],
    description="ClickHouse exponentialMovingAverage (dyadic-exact "
    "variant): half-per-step decay over 16 LAG taps in one partitioned "
    "window; exact integer numerator/denominator pair",
)

# largestTriangleThreeBuckets(24), the SQL-expressible variant: fixed
# time-width buckets with QUANTIZED bucket-mean anchors.  Canonical
# LTTB anchors on the previously *selected* point (a sequential
# recurrence); anchoring on the neighbor buckets' means is the
# standard parallel variant, and quantizing those means to the integer
# (seconds x cents) grid keeps every triangle area an exact BIGINT
# whose magnitude is independent of row count — the same |cross
# product| argmax at 100 TB as at sf0.001.  First/last buckets keep
# the series' first/last point (canonical LTTB), pinned by flipping
# the time tiebreak for the last bucket.  Empty interior buckets
# simply shift the LAG/LEAD anchors to the nearest non-empty
# neighbor (documented variant behavior).
_LTTB_TEMPLATE = """
    WITH pts AS (
      -- integer seconds via explicit floor: `/` is float division in
      -- BOTH dialects, and a DOUBLE t_s would make SUM(t_s) summation-
      -- order dependent.  (The floor itself is safe: micros < 2^53 are
      -- exact, and fractional parts are >= 1e-6 while a half-ulp at
      -- 1.7e9 is ~2.4e-7, so the quotient can never round across an
      -- integer boundary.)
      SELECT CAST(FLOOR({EPOCH_US}(ts) / 1000000.0) AS BIGINT) AS t_s,
             CAST(FLOOR(value * 100) AS BIGINT) AS y,
             event_id
      FROM events
    ),
    ext AS (
      SELECT MIN(t_s) AS tmin, MAX(t_s) AS tmax FROM pts
    ),
    b AS (
      SELECT p.t_s, p.y, p.event_id,
             LEAST(23, CAST(FLOOR((p.t_s - ext.tmin) * 24.0
                                  / (ext.tmax - ext.tmin + 1)) AS INT))
               AS bucket
      FROM pts p CROSS JOIN ext
    ),
    sums AS (
      SELECT bucket, COUNT(*) AS n,
             CAST(SUM(t_s) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy
      FROM b
      GROUP BY bucket
    ),
    anchors AS (
      SELECT bucket,
             LAG(CAST(FLOOR(CAST(sx AS DOUBLE) / n) AS BIGINT))
               OVER (ORDER BY bucket) AS xa,
             LAG(CAST(FLOOR(CAST(sy AS DOUBLE) / n) AS BIGINT))
               OVER (ORDER BY bucket) AS ya,
             LEAD(CAST(FLOOR(CAST(sx AS DOUBLE) / n) AS BIGINT))
               OVER (ORDER BY bucket) AS xc,
             LEAD(CAST(FLOOR(CAST(sy AS DOUBLE) / n) AS BIGINT))
               OVER (ORDER BY bucket) AS yc,
             MAX(bucket) OVER () AS last_bucket
      FROM sums
    ),
    scored AS (
      SELECT b.bucket, b.t_s, b.y, b.event_id, a.last_bucket,
             CASE WHEN a.xa IS NULL OR a.xc IS NULL THEN CAST(0 AS BIGINT)
                  ELSE ABS((a.xa - a.xc) * (b.y - a.ya)
                           - (a.xa - b.t_s) * (a.yc - a.ya))
             END AS area2
      FROM b JOIN anchors a ON b.bucket = a.bucket
    ),
    sel AS (
      SELECT bucket, t_s, y, event_id, area2,
             ROW_NUMBER() OVER (
               PARTITION BY bucket
               ORDER BY area2 DESC,
                        CASE WHEN bucket = last_bucket THEN -t_s
                             ELSE t_s END,
                        event_id
             ) AS rn
      FROM scored
    )
    SELECT bucket, t_s AS t_seconds, y AS value_cents, event_id
    FROM sel
    WHERE rn = 1
    ORDER BY bucket
"""

REGISTRY.sql_query(
    "events_lttb_downsample",
    _LTTB_TEMPLATE.format(EPOCH_US="unix_micros"),
    oracle=_LTTB_TEMPLATE.format(EPOCH_US="epoch_us"),
    tables=["events"],
    tags=["compat", "downsample", "window"],
    description="ClickHouse largestTriangleThreeBuckets(24), quantized "
    "bucket-mean-anchor variant: integer-exact triangle areas whose "
    "magnitude is row-count independent; per-bucket argmax with pinned "
    "tiebreaks, first/last points kept",
)

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


# --- ORDER BY ... WITH FILL (r10) -------------------------------------------
# ClickHouse fills missing ORDER BY values with interpolated rows
# (`WITH FILL FROM a TO b STEP s`).  Re-expressed Spark-first as a
# generated calendar LEFT JOIN: the 1-row extent relation broadcasts,
# the calendar is |event_types| x |days| rows — trivially small
# relative to the fact table at any scale — and the fill join is an
# equi-join on (event_type, day).  Aggregates are cents-exact; filled
# rows carry COALESCE(0) like ClickHouse's default fill value.  The
# ORACLE builds the calendar with DuckDB's generate_series table
# function instead of Spark's sequence()+explode — independent
# formulations of the fill.
_WITH_FILL_SPARK = """
    WITH agg AS (
      SELECT event_type, date_trunc('DAY', ts) AS d,
             COUNT(*) AS n,
             CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT)
               AS v_cents
      FROM events
      GROUP BY event_type, date_trunc('DAY', ts)
    ),
    ext AS (SELECT MIN(d) AS d0, MAX(d) AS d1 FROM agg),
    cal AS (
      SELECT t.event_type, e.day
      FROM (SELECT DISTINCT event_type FROM agg) t
      CROSS JOIN (
        SELECT explode(sequence(d0, d1, interval 1 day)) AS day FROM ext
      ) e
    )
    SELECT c.event_type, c.day AS bucket,
           CAST(COALESCE(a.n, 0) AS BIGINT) AS n,
           CAST(COALESCE(a.v_cents, 0) AS BIGINT) AS v_cents
    FROM cal c
    LEFT JOIN agg a ON a.event_type = c.event_type AND a.d = c.day
    ORDER BY c.event_type, bucket
"""
_WITH_FILL_DUCK = """
    WITH agg AS (
      SELECT event_type, date_trunc('day', ts) AS d,
             COUNT(*) AS n,
             CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT)
               AS v_cents
      FROM events
      GROUP BY event_type, date_trunc('day', ts)
    ),
    ext AS (SELECT MIN(d) AS d0, MAX(d) AS d1 FROM agg),
    cal AS (
      SELECT t.event_type, CAST(g.day AS TIMESTAMP) AS day
      FROM (SELECT DISTINCT event_type FROM agg) t
      CROSS JOIN (
        SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
        FROM ext
      ) g
    )
    SELECT c.event_type, c.day AS bucket,
           CAST(COALESCE(a.n, 0) AS BIGINT) AS n,
           CAST(COALESCE(a.v_cents, 0) AS BIGINT) AS v_cents
    FROM cal c
    LEFT JOIN agg a ON a.event_type = c.event_type AND a.d = c.day
    ORDER BY c.event_type, bucket
"""

REGISTRY.sql_query(
    "events_with_fill_step",
    _WITH_FILL_SPARK,
    oracle=_WITH_FILL_DUCK,
    tables=["events"],
    tags=["compat", "gap-fill", "calendar"],
    description="ClickHouse ORDER BY ... WITH FILL STEP 1 DAY: "
    "generated per-type day calendar LEFT JOINed to the daily "
    "aggregate, missing buckets zero-filled (oracle: independent "
    "generate_series calendar)",
)


# --- sequenceMatch with a time condition (r10) ------------------------------
# ClickHouse `sequenceMatch('(?1)(?t<=600)(?2)')(ts, A, B)`: did an A
# event get followed by a B event within the window, per user.  The
# time-bounded pair search is an equi-join on user_id with a bounded
# range predicate on ts — at scale the user_id key bounds each join
# group (the binned-range precedent join_time_window_binned handles
# the keyless variant).  Counting users, pairs and the tightest gap
# keeps the output small and hash-stable.
_SEQ_MATCH_TIMED_SQL = """
    WITH a AS (
      SELECT user_id, ts FROM events WHERE event_type = 'click'
    ),
    b AS (
      SELECT user_id, ts FROM events WHERE event_type = 'purchase'
    ),
    hits AS (
      SELECT a.user_id,
             CAST(UNIX_MICROS_DIFF(b.ts, a.ts) AS BIGINT) AS gap_us
      FROM a JOIN b
        ON a.user_id = b.user_id
       AND b.ts > a.ts
       AND b.ts <= a.ts + INTERVAL 10 MINUTES
    )
    SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS users_matched,
           CAST(COUNT(*) AS BIGINT) AS pairs,
           CAST(MIN(gap_us) AS BIGINT) AS min_gap_us
    FROM hits
"""

# named so the streaming twin (stream_sequence_match_timed) grades
# against the same oracle
SEQ_MATCH_TIMED_ORACLE_SQL = _SEQ_MATCH_TIMED_SQL.replace(
    "UNIX_MICROS_DIFF(b.ts, a.ts)", "epoch_us(b.ts) - epoch_us(a.ts)"
)

REGISTRY.sql_query(
    "events_sequence_match_timed",
    _SEQ_MATCH_TIMED_SQL.replace(
        "UNIX_MICROS_DIFF(b.ts, a.ts)", "unix_micros(b.ts) - unix_micros(a.ts)"
    ),
    oracle=SEQ_MATCH_TIMED_ORACLE_SQL,
    tables=["events"],
    tags=["compat", "sequence", "join"],
    description="ClickHouse sequenceMatch('(?1)(?t<=600)(?2)'): click "
    "followed by purchase within 10 minutes per user (user-keyed "
    "bounded-range join; users/pairs/tightest-gap summary)",
)
