"""Event-sequence analytics — the signature ClickHouse aggregates
(``windowFunnel``, ``retention``, ``sequenceMatch``), FINAL-style
dedup-on-read, and WITH FILL gap filling, re-expressed as pure
relational algebra. The reference is a ClickHouse-ecosystem extension
(SURVEY.md §0), so these are the queries its users run server-side
through ``clickhouse_scan``; here the host engine supplies them.

``window_funnel_sql`` — max chain prefix (view -> click -> purchase)
matched in strict (ts, event_id) order with every step within
``window_us`` of the chain's FIRST event, per user. NOT the naive
k-way self-join (per-user event counts make that fan out as count**k
— 2.2M candidate triples per heavy user at sf0.1): the greedy DP
"keep the latest viable chain-start per level" is exact (a later
start dominates: it can only satisfy more future window checks), and
each DP level is one running-MAX window pass over the SAME partition
ordering — Catalyst plans ONE user-keyed shuffle + sort for all
levels, cost linear in events regardless of funnel depth.

``retention_sql`` — classic cohort retention: cohort = first active
day, one row per (cohort_day, day_offset) with distinct-user counts.
Day numbers are integer epoch-microsecond divisions, so every value
is exact in both engines.

Scale: both are single user/cohort-keyed aggregations with map-side
combine; no joins, no driver collection. Timestamp parity idiom as in
operators/zorder.py (unix_micros vs epoch_us).
"""

from __future__ import annotations

FUNNEL_CHAIN = ("view", "click", "purchase")


def _t_expr(dialect: str) -> str:
    if dialect == "spark":
        return "unix_micros(CAST(ts AS TIMESTAMP))"
    return "epoch_us(CAST(ts AS TIMESTAMP))"


def window_funnel_sql(
    dialect: str,
    chain: tuple[str, ...] = FUNNEL_CHAIN,
    window_us: int = 4 * 3600 * 1_000_000,
) -> str:
    """Per-user funnel level over ``chain`` within ``window_us``.

    Level k requires events e1 < ... < ek (strict (t, event_id)
    order) with types chain[1..k] and ek.t - e1.t <= window_us.
    DP invariant: after pass j, ``best{j}`` at each row is the
    maximal chain-start time over all valid j-prefixes ending
    strictly before that row.
    """
    t = _t_expr(dialect)
    types = ", ".join(f"'{c}'" for c in chain)
    frame = (
        "PARTITION BY user_id ORDER BY t, event_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING"
    )
    ctes = [
        f"ev AS (SELECT user_id, event_id, event_type, {t} AS t "
        f"FROM events WHERE event_type IN ({types}))",
        # level 1: a view itself starts a chain at its own time
        "w1 AS (SELECT *, CASE WHEN event_type = "
        f"'{chain[0]}' THEN t END AS start1 FROM ev)",
    ]
    prev = "start1"
    for j in range(2, len(chain) + 1):
        ctes.append(
            f"b{j} AS (SELECT *, MAX({prev}) OVER ({frame}) AS best{j} "
            f"FROM w{j - 1})"
        )
        ctes.append(
            f"w{j} AS (SELECT *, CASE WHEN event_type = '{chain[j - 1]}' "
            f"AND best{j} IS NOT NULL AND t - best{j} <= {window_us} "
            f"THEN best{j} END AS start{j} FROM b{j})"
        )
        prev = f"start{j}"
    last = f"w{len(chain)}"
    level_expr = " + ".join(
        f"MAX(CASE WHEN start{j} IS NOT NULL THEN 1 ELSE 0 END)"
        for j in range(1, len(chain) + 1)
    )
    joined_ctes = ",\n    ".join(ctes)
    return f"""
    WITH {joined_ctes}
    SELECT user_id,
           CAST({level_expr} AS INT) AS funnel_level
    FROM {last}
    GROUP BY user_id
    ORDER BY user_id
    """


def retention_sql(dialect: str, max_offset: int = 30) -> str:
    """Cohort retention triangle: users grouped by first-active day,
    counted distinct on each later day they return."""
    t = _t_expr(dialect)
    idiv = "DIV" if dialect == "spark" else "//"
    day = f"CAST({t} {idiv} 86400000000 AS BIGINT)"
    return f"""
    WITH activity AS (
      SELECT DISTINCT user_id, {day} AS day FROM events
    ),
    cohorts AS (
      SELECT user_id, MIN(day) AS cohort_day FROM activity GROUP BY user_id
    )
    SELECT c.cohort_day,
           a.day - c.cohort_day AS day_offset,
           COUNT(DISTINCT a.user_id) AS n_users
    FROM activity a
    JOIN cohorts c ON a.user_id = c.user_id
    WHERE a.day - c.cohort_day <= {max_offset}
    GROUP BY c.cohort_day, a.day - c.cohort_day
    ORDER BY cohort_day, day_offset
    """


def sequence_match_sql(dialect: str) -> str:
    """ClickHouse ``sequenceMatch``-style pattern detection: each
    user's events collapse (in strict (t, event_id) order) into a
    one-char-per-event code string, and the patterns become plain
    LIKE/regex matches — '(?1).*(?2).*(?3)' is ``'%v%c%p%'``, the
    no-intervening-step variant is a character-class regex. One
    user-keyed ordered aggregation; the sequence string is bounded by
    the user's event count (cap per user upstream at 100 TB, the same
    rule as the funnel's membership cap).

    Parity: the code string is deterministic (total order tie-broken
    by event_id), LIKE is engine-identical, and the regex
    ``v[^p]*c[^v]*p`` uses only portable syntax semantics shared by
    Spark's Java regex and DuckDB's RE2."""
    t = _t_expr(dialect)
    # Spark has no ORDER BY inside an aggregate: collect
    # (t, event_id, code) structs and sort_array (lexicographic by
    # field order = the same total order DuckDB's ordered string_agg
    # uses), then project the codes out
    agg = (
        "concat_ws('', transform(sort_array(array_agg(struct(t, event_id, code))), x -> x.code))"
        if dialect == "spark"
        else "string_agg(code, '' ORDER BY t, event_id)"
    )
    rx = (
        "seq RLIKE 'v[^p]*c[^v]*p'"
        if dialect == "spark"
        else "regexp_matches(seq, 'v[^p]*c[^v]*p')"
    )
    ln = "length(seq)" if dialect == "spark" else "len(seq)"
    return f"""
    WITH ev AS (
      SELECT user_id,
             CASE event_type WHEN 'view' THEN 'v' WHEN 'click' THEN 'c'
                  WHEN 'purchase' THEN 'p' WHEN 'signup' THEN 's'
                  ELSE 'e' END AS code,
             {t} AS t,
             event_id
      FROM events
    ),
    seqs AS (
      SELECT user_id, {agg} AS seq
      FROM ev GROUP BY user_id
    )
    SELECT user_id,
           CAST(CASE WHEN seq LIKE '%v%c%p%' THEN 1 ELSE 0 END AS INT) AS m_funnel,
           CAST(CASE WHEN {rx} THEN 1 ELSE 0 END AS INT) AS m_strictish,
           CAST(CASE WHEN seq LIKE '%ss%' THEN 1 ELSE 0 END AS INT) AS m_double_signup,
           CAST({ln} AS BIGINT) AS n_events
    FROM seqs
    ORDER BY user_id
    """


# ReplacingMergeTree-style dedup-on-read (the `FINAL` semantics a
# ClickHouse user expects): latest row per (user_id, event_type) by
# (ts, event_id) version. Identical text parses in both engines; one
# window shuffle keyed on the dedup key, no self-join.
REPLACING_MERGE_SQL = """
    WITH ranked AS (
      SELECT user_id, event_type, value, event_id,
             ROW_NUMBER() OVER (
               PARTITION BY user_id, event_type
               ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    )
    SELECT user_id, event_type,
           CAST(value AS DOUBLE) AS latest_value,
           event_id AS latest_event_id
    FROM ranked WHERE rn = 1
    ORDER BY user_id, event_type
    """


# SummingMergeTree-style read (the other signature merge engine): rows
# sharing the ORDER BY key collapse to one row whose numeric columns
# are SUMS; a GROUP BY with map-side partial aggregation IS that merge
# performed at read time — the at-scale shape ClickHouse materializes
# in the background. DECIMAL accumulation keeps the sum exact in both
# engines (the q1 precedent); n_rows documents how many raw rows
# collapsed into each merged one.
SUMMING_MERGE_SQL = """
    SELECT user_id, event_type,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
           COUNT(*) AS n_rows,
           MIN(event_id) AS first_event_id
    FROM events
    GROUP BY user_id, event_type
    ORDER BY user_id, event_type
    """


# ClickHouse GROUP BY ... WITH TOTALS: the per-group rows PLUS one
# grand-total row. ROLLUP over the single grouping column is exactly
# that; GROUPING() flags the totals row (its event_type is NULL), and
# ordering it last mirrors ClickHouse's separate totals block.
GROUP_WITH_TOTALS_SQL = """
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value,
           CAST(GROUPING(event_type) AS INT) AS is_totals
    FROM events
    GROUP BY ROLLUP (event_type)
    ORDER BY is_totals, event_type NULLS LAST
    """


def gap_fill_sql(dialect: str, n_hours: int = 720) -> str:
    """ClickHouse ``ORDER BY ... WITH FILL`` + ``INTERPOLATE``
    re-expressed: a dense hourly spine (generated, not scanned) left-
    joined onto the sparse per-type hourly aggregates, missing counts
    zero-filled and the value series carried forward (LOCF) with an
    ignore-nulls running last_value window.

    Parity: the spine is integer hour numbers from the fixed corpus
    epoch (exact), counts are exact, and the LOCF projection copies
    previously-aggregated doubles without arithmetic. Scale shape: the
    spine is |hours| x |types| rows (generated map-side), the join is
    keyed on (type, hour) — broadcast the spine at any corpus size —
    and the LOCF window partitions by type, one small shuffle.
    """
    t = _t_expr(dialect)
    idiv = "DIV" if dialect == "spark" else "//"
    # epoch hour of 2024-01-01 00:00 UTC = 1704067200 / 3600
    base_hour = 1_704_067_200 // 3600
    if dialect == "spark":
        spine_hours = (
            f"SELECT explode(sequence(0, {n_hours - 1})) AS i"
        )
        locf = (
            "last_value(avg_value_raw) IGNORE NULLS OVER "
            "(PARTITION BY event_type ORDER BY hour_no "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
        )
    else:
        spine_hours = f"SELECT unnest(range({n_hours})) AS i"
        locf = (
            "last_value(avg_value_raw IGNORE NULLS) OVER "
            "(PARTITION BY event_type ORDER BY hour_no "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
        )
    return f"""
    WITH spine_h AS ({spine_hours}),
    types AS (SELECT DISTINCT event_type FROM events),
    spine AS (
      SELECT t.event_type, CAST({base_hour} + s.i AS BIGINT) AS hour_no
      FROM types t CROSS JOIN spine_h s
    ),
    hourly AS (
      SELECT event_type,
             CAST({t} {idiv} 3600000000 AS BIGINT) AS hour_no,
             COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)
               AS avg_value_raw
      FROM events
      GROUP BY event_type, CAST({t} {idiv} 3600000000 AS BIGINT)
    ),
    joined AS (
      SELECT s.event_type, s.hour_no,
             COALESCE(h.n, 0) AS n,
             h.avg_value_raw
      FROM spine s LEFT JOIN hourly h
        ON s.event_type = h.event_type AND s.hour_no = h.hour_no
    )
    SELECT event_type, hour_no,
           CAST(n AS BIGINT) AS n,
           {locf} AS avg_value_locf
    FROM joined
    ORDER BY event_type, hour_no
    """


def sequence_count_sql(dialect: str) -> str:
    """ClickHouse ``sequenceCount``: how many NON-OVERLAPPING
    view->click->purchase chains each user completed, in order. The
    greedy counter (consume the earliest available prefix at each
    step) is optimal for subsequence matching, and it is a pure FOLD
    over the user's ordered event codes — so both engines run it as a
    higher-order reduce (Spark ``aggregate``, DuckDB ``list_reduce``),
    no UDF, no iteration, engine-exact integers.

    Spark state packing: acc = f1*2^20 + f2*2^10 + f3 where f_k =
    events matched at chain level k (f1 >= f2 >= f3 invariant); one
    BIGINT, counts capped at 1000 per user (the same per-user cap
    rule every sequence operator documents for 100 TB corpora). The
    DuckDB oracle runs the SAME greedy transition as a recursive CTE
    over list positions (unpacked columns) — NOT ``list_reduce``,
    which in DuckDB 1.0 returns a wrong fold for some rows when
    evaluated over many rows at once (verified: correct for a row in
    isolation, wrong for the same row inside a 150-row batch), so the
    two sides are also structurally independent implementations of
    the greedy counter. Scale shape (Spark): one user-keyed ordered
    aggregation, then a map-side fold."""
    t = _t_expr(dialect)
    if dialect == "spark":
        f1 = "(acc DIV 1048576)"
        f2 = "((acc DIV 1024) % 1024)"
        f3 = "(acc % 1024)"
        step = (
            f"CASE WHEN x = 1 AND {f1} < 1000 THEN acc + 1048576 "
            f"WHEN x = 2 AND {f1} > {f2} THEN acc + 1024 "
            f"WHEN x = 3 AND {f2} > {f3} THEN acc + 1 "
            "ELSE acc END"
        )
        codes = (
            "transform(sort_array(array_agg(struct(t, event_id, code))), "
            "x -> CAST(x.code AS BIGINT))"
        )
        fold = f"aggregate(codes, CAST(0 AS BIGINT), (acc, x) -> {step})"
        return f"""
    WITH ev AS (
      SELECT user_id, event_id, {t} AS t,
             CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2
                  WHEN 'purchase' THEN 3 END AS code
      FROM events
      WHERE event_type IN ('view', 'click', 'purchase')
    ),
    seqs AS (
      SELECT user_id, {codes} AS codes FROM ev GROUP BY user_id
    )
    SELECT user_id, CAST({fold} % 1024 AS BIGINT) AS n_chains
    FROM seqs
    ORDER BY user_id
    """
    return f"""
    WITH RECURSIVE ev AS (
      SELECT user_id, event_id, {t} AS t,
             CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2
                  WHEN 'purchase' THEN 3 END AS code
      FROM events
      WHERE event_type IN ('view', 'click', 'purchase')
    ),
    seqs AS (
      SELECT user_id,
             list_transform(array_agg(code ORDER BY t, event_id),
                            x -> CAST(x AS BIGINT)) AS codes
      FROM ev GROUP BY user_id
    ),
    fold AS (
      SELECT user_id, codes, 0 AS i,
             CAST(0 AS BIGINT) AS f1, CAST(0 AS BIGINT) AS f2,
             CAST(0 AS BIGINT) AS f3
      FROM seqs
      UNION ALL
      SELECT user_id, codes, i + 1,
             CASE WHEN codes[i + 1] = 1 AND f1 < 1000 THEN f1 + 1 ELSE f1 END,
             CASE WHEN codes[i + 1] = 2 AND f1 > f2 THEN f2 + 1 ELSE f2 END,
             CASE WHEN codes[i + 1] = 3 AND f2 > f3 THEN f3 + 1 ELSE f3 END
      FROM fold WHERE i < len(codes)
    )
    SELECT user_id, f3 AS n_chains
    FROM fold WHERE i = len(codes)
    ORDER BY user_id
    """


def histogram_sql(dialect: str, n_bins: int = 10, lo: float = 0.0, hi: float = 100.0) -> str:
    """ClickHouse ``histogram``-role equi-width histogram over the
    events value column: deterministic fixed-width bins (the adaptive
    ClickHouse variant is sampling-dependent; the fixed-width form is
    the engine-exact analogue). Bins are left-closed; the top edge
    value lands in the last bin. One map-side-combinable GROUP BY."""
    w = (hi - lo) / n_bins
    return f"""
    WITH binned AS (
      SELECT LEAST(CAST(FLOOR((CAST(value AS DOUBLE) - {lo}) / {w}) AS BIGINT),
                   {n_bins - 1}) AS bin
      FROM events
      WHERE value IS NOT NULL AND value >= {lo} AND value <= {hi}
    )
    SELECT bin,
           CAST({lo} + bin * {w} AS DOUBLE) AS bin_lo,
           CAST({lo} + (bin + 1) * {w} AS DOUBLE) AS bin_hi,
           COUNT(*) AS n
    FROM binned
    GROUP BY bin
    ORDER BY bin
    """


def time_window_join_sql(dialect: str, window_s: int = 600) -> str:
    """Time-window join via BIN BUCKETING — the scale-safe form of a
    range join: each 'signup' event must count the 'click' events (any
    user) within +-``window_s`` seconds. The naive plan is a non-equi
    join (nested-loop or unsplittable range sort-merge); the binned
    form explodes the probe side into its 3 covering bins of width
    ``window_s`` and EQUI-joins on the bin, applying the exact range
    predicate inside the join — shuffle keyed, AQE-coalescible, and
    each bin pair touches only temporally-local rows. The oracle runs
    the naive non-equi join, proving the decomposition exact."""
    t = _t_expr(dialect)
    usec = window_s * 1_000_000
    if dialect == "spark":
        expl = (
            "LATERAL VIEW explode(array(b - 1, b, b + 1)) g AS bin"
        )
        binexpr = f"CAST({t} DIV {usec} AS BIGINT)"
        cbin = f"CAST({t} DIV {usec} AS BIGINT)"
    else:
        expl = ", UNNEST([b - 1, b, b + 1]) AS g(bin)"
        binexpr = f"CAST({t} // {usec} AS BIGINT)"
        cbin = f"CAST({t} // {usec} AS BIGINT)"
    return f"""
    WITH s AS (
      SELECT event_id, user_id, {t} AS ts_us, {binexpr} AS b
      FROM events WHERE event_type = 'signup'
    ),
    sb AS (SELECT event_id, user_id, ts_us, bin FROM s {expl}),
    c AS (
      SELECT {t} AS cts_us, {cbin} AS bin
      FROM events WHERE event_type = 'click'
    )
    SELECT sb.event_id, sb.user_id,
           COUNT(c.cts_us) AS n_nearby_clicks
    FROM sb LEFT JOIN c
      ON sb.bin = c.bin
     AND c.cts_us BETWEEN sb.ts_us - {usec} AND sb.ts_us + {usec}
    GROUP BY sb.event_id, sb.user_id
    ORDER BY sb.event_id
    """


TIME_WINDOW_JOIN_ORACLE = """
    SELECT s.event_id, s.user_id,
           CAST(COALESCE(SUM(CASE WHEN c.cts BETWEEN s.ts - 600000000
                                   AND s.ts + 600000000 THEN 1 ELSE 0 END), 0)
                AS BIGINT) AS n_nearby_clicks
    FROM (SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts
          FROM events WHERE event_type = 'signup') s
    LEFT JOIN (SELECT epoch_us(CAST(ts AS TIMESTAMP)) AS cts
               FROM events WHERE event_type = 'click') c ON TRUE
    GROUP BY s.event_id, s.user_id
    ORDER BY s.event_id
    """


# ClickHouse ``deltaSum``: the sum of POSITIVE increments of an
# ordered series (counter-reset-tolerant rate accumulation). One
# window pass per user. Parity: each per-row delta is an IEEE double
# (deterministic), floored to a 1e-6 fixed-point BIGINT before the
# SUM, so the aggregate is order-independent integer arithmetic —
# a raw SUM of doubles would be ordering-dependent across engines.
DELTA_SUM_SQL = """
    WITH d AS (
      SELECT user_id,
             CAST(value AS DOUBLE)
               - lag(CAST(value AS DOUBLE)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS dv
      FROM events
    )
    SELECT user_id,
           CAST(SUM(CASE WHEN dv > 0
                 THEN CAST(FLOOR(dv * 1000000) AS BIGINT)
                 ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS delta_sum_fp
    FROM d
    GROUP BY user_id
    ORDER BY user_id
    """


# ClickHouse ``uniqUpTo(N)``: exact distinct count, saturating at N+1
# ("more than N" answers membership-style product questions without
# carrying the full distinct set). The saturation is applied AFTER an
# exact distinct aggregation here — at 100 TB the real saving comes
# from a partial-distinct cap per partition, which Spark's partial
# aggregation already approximates; the semantics contract is the
# LEAST() projection, identical in both engines.
UNIQ_UPTO_SQL = """
    SELECT event_type,
           CAST(LEAST(COUNT(DISTINCT user_id), 11) AS BIGINT) AS uniq_upto_10,
           CAST(CASE WHEN COUNT(DISTINCT user_id) > 10 THEN 1 ELSE 0 END AS INT)
             AS saturated
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """


def window_funnel_strict_sql(
    dialect: str,
    chain: tuple[str, ...] = FUNNEL_CHAIN,
    window_us: int = 4 * 3600 * 1_000_000,
) -> str:
    """ClickHouse ``windowFunnel(window)(strict_order)`` variant.

    strict_order forbids interleaving: ANY event (chain or not)
    between two chain steps interrupts the chain, which makes a
    level-k achievement equivalent to K CONSECUTIVE events — in the
    user's full (t, event_id) order over ALL events — whose types
    spell chain[0..k-1] with t_k - t_1 <= window. A repeated chain[0]
    restarts the chain (the fold view: non-matching events reset to
    level 0, chain[0] always re-arms), which the consecutive-run view
    captures for free.

    The Spark form matches runs FORWARD with LEAD; the oracle matches
    the same runs BACKWARD with LAG from the run's last element — two
    mirrored formulations whose agreement (plus the plain-Python pin
    in tests/test_events_python_reference.py) guards the semantics.
    """
    t = _t_expr(dialect)
    k = len(chain)
    if dialect == "spark":
        over = "PARTITION BY user_id ORDER BY t, event_id"
        steps = []
        for j in range(1, k):
            steps.append(f"LEAD(event_type, {j}) OVER ({over}) AS ty{j}")
            steps.append(f"LEAD(t, {j}) OVER ({over}) AS t{j}")
        sel = ",\n             ".join(steps)
        lvl = []
        for j in range(1, k + 1):
            conds = [f"event_type = '{chain[0]}'"]
            for i in range(1, j):
                conds.append(f"ty{i} = '{chain[i]}'")
            if j > 1:
                conds.append(f"t{j - 1} - t <= {window_us}")
            lvl.append(
                f"MAX(CASE WHEN {' AND '.join(conds)} THEN {j} ELSE 0 END)"
            )
        level = f"GREATEST({', '.join(lvl)})"
        return f"""
        WITH ev AS (
          SELECT user_id, event_id, event_type, {t} AS t FROM events
        ),
        runs AS (
          SELECT user_id, event_type, t,
             {sel}
          FROM ev
        )
        SELECT user_id, CAST({level} AS INT) AS strict_level
        FROM runs GROUP BY user_id ORDER BY user_id
        """
    # duckdb: anchor on the run's LAST element, look back with LAG
    over = "PARTITION BY user_id ORDER BY t, event_id"
    steps = []
    for j in range(1, k):
        steps.append(f"LAG(event_type, {j}) OVER ({over}) AS py{j}")
        steps.append(f"LAG(t, {j}) OVER ({over}) AS p{j}")
    sel = ",\n             ".join(steps)
    lvl = []
    for j in range(1, k + 1):
        # run of length j ending HERE: this event is chain[j-1], the
        # i-th previous is chain[j-1-i]
        conds = [f"event_type = '{chain[j - 1]}'"]
        for i in range(1, j):
            conds.append(f"py{i} = '{chain[j - 1 - i]}'")
        if j > 1:
            conds.append(f"t - p{j - 1} <= {window_us}")
        lvl.append(
            f"MAX(CASE WHEN {' AND '.join(conds)} THEN {j} ELSE 0 END)"
        )
    level = f"GREATEST({', '.join(lvl)})"
    return f"""
    WITH ev AS (
      SELECT user_id, event_id, event_type, {t} AS t FROM events
    ),
    runs AS (
      SELECT user_id, event_type, t,
         {sel}
      FROM ev
    )
    SELECT user_id, CAST({level} AS INT) AS strict_level
    FROM runs GROUP BY user_id ORDER BY user_id
    """
