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
    ORDER BY is_totals, event_type
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
