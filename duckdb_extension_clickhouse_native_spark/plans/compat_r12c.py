"""Round-12 third compatibility tranche: the remaining ClickHouse
aggregate/scalar/table-function signatures surfaced by a fresh sweep
of the public function reference against the registry.

* ``leftPad`` / ``rightPad`` / ``splitByChar`` / ``arrayStringConcat``
  / ``substringIndex``-adjacent accessors — the string pad/split
  family (docs: sql-reference/functions/string-functions,
  splitting-merging-functions).  Spark spells them
  ``lpad/rpad/split/array_join/element_at``; the DuckDB oracle uses
  ``lpad/rpad/string_split/array_to_string/[-1]`` — structurally
  independent list machinery on each side.
* ``groupUniqArray`` / ``sumCount`` / ``sumKahan`` / ``anyHeavy`` —
  the aggregate grab-bag.  groupUniqArray is a sorted collect_set
  serialized to a CSV string (ClickHouse returns arbitrary order; the
  sorted form is the deterministic documented variant, the string form
  keeps the oracle driver-hashable — collect_sorted_arrays precedent).  sumCount returns (sum, count)
  as two columns.  sumKahan's compensated float summation is made
  exact instead: BIGINT cents (stronger guarantee than Kahan).
  anyHeavy (Boyer-Moore heavy hitter) is approximated by the exact
  mode with a value tie-break — deterministic superset of the
  guarantee ("a frequently occurring value").
* ``hasAll`` / ``hasAny`` / ``hasSubstr`` / ``arrayFold`` — array
  membership + ordered-fold family (docs:
  sql-reference/functions/array-functions).  The fold uses a
  non-commutative accumulator (acc*3+x) so element ORDER is what is
  being checked across engines, not just content.  hasSubstr
  (contiguous subsequence) renders both arrays as delimited strings
  on both sides — same trick, independently evaluated.
* ``meanZTest`` (docs: aggregate-functions/reference/meanztest) —
  two-sample z statistic with population variances taken from the
  data.  Exact BIGINT/DECIMAL(38,0) cent moments; z is
  scale-invariant so the cents never convert back; one fused double
  expression, ROUND(,6)-guarded.
* ``quantileTiming`` (docs: aggregate-functions/reference/
  quantiletiming) — ClickHouse's bounded-grid timing quantile:
  values < 1024 exact, 1024..30000 snapped down to 16 ms buckets,
  > 30000 clamped to 30000.  Because the grid is BOUNDED (< 3000
  distinct cells by construction) the scale plan is a grouped count
  + cumulative-sum walk — no global per-row sort, no single-reducer
  window over raw rows.  Type-1 (lower) discrete quantile.
* ``categoricalInformationValue`` (docs: aggregate-functions/
  reference/categoricalinformationvalue) — per-category
  (p_good - p_bad) * ln(p_good/p_bad) summed into the information
  value; categories with an empty cell are excluded on BOTH sides
  (documented; ClickHouse emits nan/inf there).  ROUND(,6) guard on
  the 25-term double sum.
* ``numbers(N)`` + a deterministic ``generateRandom`` analogue
  (docs: sql-reference/table-functions/numbers, generate) — Spark's
  ``range()`` TVF vs DuckDB's ``range()`` TVF, with a 31-bit LCG
  (x*1103515245 + 12345 mod 2^31) standing in for generateRandom so
  both engines derive the identical pseudo-random column without
  either engine's RNG.

Determinism rules follow base.py: integer cents via FLOOR(value*100),
exact BIGINT/DECIMAL(38,0) sums, single fused double expressions where
a ratio must cross engines, ROUND() only as a documented libm guard.
"""

from __future__ import annotations

from .base import REGISTRY

# --- string pad/split family --------------------------------------------------
# Spark: lpad/rpad pad-or-truncate to the target length, split() takes
# a regex, element_at(arr, -1) is the tail. A deterministic 1/41
# partkey slice keeps the graded payload small without ORDER-BY-LIMIT
# ambiguity (every selected row is emitted).
_PAD_SPLIT_SPARK = """
    SELECT p_partkey,
           lpad(p_brand, 12, '*') AS padded_left,
           rpad(p_brand, 12, '.') AS padded_right,
           split_part(p_type, ' ', 2) AS type_word2,
           CAST(size(split(p_type, ' ')) AS BIGINT) AS n_words,
           array_join(split(p_type, ' '), '-') AS type_dashed,
           element_at(split(p_type, ' '), -1) AS type_last
    FROM part
    WHERE p_partkey % 41 = 0
    ORDER BY p_partkey
"""

_PAD_SPLIT_ORACLE = """
    SELECT p_partkey,
           lpad(p_brand, 12, '*') AS padded_left,
           rpad(p_brand, 12, '.') AS padded_right,
           split_part(p_type, ' ', 2) AS type_word2,
           CAST(len(string_split(p_type, ' ')) AS BIGINT) AS n_words,
           array_to_string(string_split(p_type, ' '), '-') AS type_dashed,
           string_split(p_type, ' ')[-1] AS type_last
    FROM part
    WHERE p_partkey % 41 = 0
    ORDER BY p_partkey
"""

REGISTRY.sql_query(
    "scalar_string_pad_split",
    _PAD_SPLIT_SPARK,
    oracle=_PAD_SPLIT_ORACLE,
    tables=["part"],
    tags=["compat", "scalar", "string"],
    description=(
        "ClickHouse leftPad/rightPad/splitByChar/arrayStringConcat: "
        "Spark lpad/rpad/split/array_join vs DuckDB "
        "lpad/rpad/string_split/array_to_string — independent list "
        "machinery, exact string outputs"
    ),
)


# --- groupUniqArray / sumCount / sumKahan / anyHeavy ---------------------------
# One hash aggregation for the moment columns; the anyHeavy proxy is
# the exact per-group mode (ties broken by value) via a second grouped
# aggregation + a 6-row window — both shuffles keyed on l_returnflag.
_AGG_GRABBAG_SPARK = """
    WITH agg AS (
      SELECT l_returnflag,
             array_join(sort_array(collect_set(l_linestatus)), ',')
               AS uniq_status,
             CAST(SUM(CAST(FLOOR(l_quantity) AS BIGINT)) AS BIGINT)
               AS sum_qty,
             COUNT(l_quantity) AS cnt_qty,
             CAST(SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS kahan_cents
      FROM lineitem
      GROUP BY l_returnflag
    ),
    mode AS (
      SELECT l_returnflag, l_linestatus AS heavy_status
      FROM (
        SELECT l_returnflag, l_linestatus,
               ROW_NUMBER() OVER (
                 PARTITION BY l_returnflag
                 ORDER BY COUNT(*) DESC, l_linestatus
               ) AS rn
        FROM lineitem
        GROUP BY l_returnflag, l_linestatus
      )
      WHERE rn = 1
    )
    SELECT agg.l_returnflag, agg.uniq_status, agg.sum_qty, agg.cnt_qty,
           agg.kahan_cents, mode.heavy_status
    FROM agg JOIN mode ON agg.l_returnflag = mode.l_returnflag
    ORDER BY agg.l_returnflag
"""

_AGG_GRABBAG_ORACLE = """
    WITH agg AS (
      SELECT l_returnflag,
             array_to_string(list_sort(list(DISTINCT l_linestatus)), ',')
               AS uniq_status,
             CAST(SUM(CAST(FLOOR(l_quantity) AS BIGINT)) AS BIGINT)
               AS sum_qty,
             COUNT(l_quantity) AS cnt_qty,
             CAST(SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS kahan_cents
      FROM lineitem
      GROUP BY l_returnflag
    ),
    mode AS (
      SELECT l_returnflag, l_linestatus AS heavy_status
      FROM (
        SELECT l_returnflag, l_linestatus,
               ROW_NUMBER() OVER (
                 PARTITION BY l_returnflag
                 ORDER BY COUNT(*) DESC, l_linestatus
               ) AS rn
        FROM lineitem
        GROUP BY l_returnflag, l_linestatus
      )
      WHERE rn = 1
    )
    SELECT agg.l_returnflag, agg.uniq_status, agg.sum_qty, agg.cnt_qty,
           agg.kahan_cents, mode.heavy_status
    FROM agg JOIN mode ON agg.l_returnflag = mode.l_returnflag
    ORDER BY agg.l_returnflag
"""

REGISTRY.sql_query(
    "agg_group_uniq_array",
    _AGG_GRABBAG_SPARK,
    oracle=_AGG_GRABBAG_ORACLE,
    tables=["lineitem"],
    tags=["compat", "agg"],
    description=(
        "ClickHouse groupUniqArray (sorted variant) + sumCount + "
        "sumKahan (made exact via BIGINT cents) + anyHeavy (exact mode "
        "with value tie-break): one grouped aggregation + a 6-row "
        "mode window, both keyed on l_returnflag"
    ),
)


# --- hasAll / hasAny / hasSubstr / arrayFold -----------------------------------
# Per-row arrays built deterministically from lineitem columns; the
# fold accumulator acc*3+x is non-commutative so element ORDER crosses
# engines, not just content. hasSubstr renders both arrays as
# '|'-delimited strings on both sides (contiguity via string search).
_ARRAY_FOLD_SPARK = """
    WITH rows_arr AS (
      SELECT l_orderkey, l_linenumber,
             array(CAST(l_linenumber AS BIGINT),
                   CAST(FLOOR(l_quantity) AS BIGINT),
                   l_partkey % 7,
                   l_suppkey % 5) AS a,
             array(l_partkey % 7, l_suppkey % 5) AS sub
      FROM lineitem
      WHERE l_orderkey % 101 = 0
    )
    SELECT l_orderkey, l_linenumber,
           aggregate(a, CAST(0 AS BIGINT), (acc, x) -> acc * 3 + x)
             AS folded,
           forall(sub, x -> array_contains(a, x)) AS has_all,
           arrays_overlap(a, array(CAST(3 AS BIGINT), CAST(4 AS BIGINT)))
             AS has_any,
           (instr(concat('|', array_join(transform(a, x -> CAST(x AS STRING)), '|'), '|'),
                  concat('|', array_join(transform(sub, x -> CAST(x AS STRING)), '|'), '|')) > 0)
             AS has_substr
    FROM rows_arr
    ORDER BY l_orderkey, l_linenumber
"""

_ARRAY_FOLD_ORACLE = """
    WITH rows_arr AS (
      SELECT l_orderkey, l_linenumber,
             [CAST(l_linenumber AS BIGINT),
              CAST(FLOOR(l_quantity) AS BIGINT),
              l_partkey % 7,
              l_suppkey % 5] AS a,
             [l_partkey % 7, l_suppkey % 5] AS sub
      FROM lineitem
      WHERE l_orderkey % 101 = 0
    )
    SELECT l_orderkey, l_linenumber,
           list_reduce(list_concat([CAST(0 AS BIGINT)], a),
                       (acc, x) -> acc * 3 + x) AS folded,
           list_has_all(a, sub) AS has_all,
           list_has_any(a, [CAST(3 AS BIGINT), CAST(4 AS BIGINT)])
             AS has_any,
           (strpos('|' || array_to_string(a, '|') || '|',
                   '|' || array_to_string(sub, '|') || '|') > 0)
             AS has_substr
    FROM rows_arr
    ORDER BY l_orderkey, l_linenumber
"""

REGISTRY.sql_query(
    "array_fold_has_ops",
    _ARRAY_FOLD_SPARK,
    oracle=_ARRAY_FOLD_ORACLE,
    tables=["lineitem"],
    tags=["compat", "array"],
    description=(
        "ClickHouse hasAll/hasAny/hasSubstr + arrayFold: Spark "
        "forall/arrays_overlap/aggregate vs DuckDB "
        "list_has_all/list_has_any/list_reduce; the non-commutative "
        "fold (acc*3+x) pins element order across engines"
    ),
)


# --- meanZTest ------------------------------------------------------------------
# Exact cent moments per sample (DECIMAL(38,0) for the squares — no
# 2^63 wrap at any SF); z is scale-invariant so cents never convert
# back; one fused double expression under a ROUND(,6) libm guard.
_MEAN_ZTEST_SPARK = """
    WITH m AS (
      SELECT o_orderstatus AS g,
             COUNT(*) AS n,
             SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS s,
             SUM(CAST(CAST(FLOOR(o_totalprice * 100) AS BIGINT)
                      AS DECIMAL(38, 0))
                 * CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS ssq
      FROM orders
      WHERE o_orderstatus IN ('F', 'O')
      GROUP BY o_orderstatus
    )
    SELECT x.n AS n_x, y.n AS n_y,
           CAST(x.s AS BIGINT) AS sum_cents_x,
           CAST(y.s AS BIGINT) AS sum_cents_y,
           ROUND(
             (CAST(x.s AS DOUBLE) / x.n - CAST(y.s AS DOUBLE) / y.n)
             / SQRT(
                 ((CAST(x.ssq AS DOUBLE)
                   - CAST(x.s AS DOUBLE) * CAST(x.s AS DOUBLE) / x.n)
                  / x.n) / x.n
                 + ((CAST(y.ssq AS DOUBLE)
                     - CAST(y.s AS DOUBLE) * CAST(y.s AS DOUBLE) / y.n)
                    / y.n) / y.n
               ),
             6) AS z_stat
    FROM m x CROSS JOIN m y
    WHERE x.g = 'F' AND y.g = 'O'
"""

REGISTRY.sql_query(
    "stats_mean_ztest",
    _MEAN_ZTEST_SPARK,
    oracle=_MEAN_ZTEST_SPARK,
    tables=["orders"],
    tags=["compat", "stats"],
    description=(
        "ClickHouse meanZTest: two-sample z with population variances "
        "from exact BIGINT/DECIMAL(38,0) cent moments, one fused "
        "double expression, ROUND(,6) guard"
    ),
)


# --- quantileTiming --------------------------------------------------------------
# The timing grid BOUNDS the domain (< 3000 distinct cells), so the
# scale plan is grouped counts + a cumulative walk over the tiny grid —
# never a global per-row sort. Type-1 (lower) discrete quantile:
# smallest grid value whose cumulative count reaches ceil(q*n).
_QUANTILE_TIMING_SPARK = """
    WITH ms AS (
      SELECT CAST(FLOOR(value * 37) AS BIGINT) % 40000 AS ms
      FROM events
    ),
    g AS (
      SELECT CASE
               WHEN ms < 1024 THEN ms
               WHEN ms <= 30000 THEN CAST(FLOOR(ms / 16) * 16 AS BIGINT)
               ELSE CAST(30000 AS BIGINT)
             END AS t
      FROM ms
    ),
    c AS (SELECT t, COUNT(*) AS cnt FROM g GROUP BY t),
    cum AS (
      SELECT t,
             SUM(cnt) OVER (ORDER BY t) AS cum,
             SUM(cnt) OVER () AS n
      FROM c
    )
    SELECT MIN(CASE WHEN cum >= CEIL(0.5 * n) THEN t END) AS p50,
           MIN(CASE WHEN cum >= CEIL(0.9 * n) THEN t END) AS p90,
           MIN(CASE WHEN cum >= CEIL(0.99 * n) THEN t END) AS p99,
           CAST(MIN(n) AS BIGINT) AS n_rows
    FROM cum
"""

REGISTRY.sql_query(
    "quantile_timing_grid",
    _QUANTILE_TIMING_SPARK,
    oracle=_QUANTILE_TIMING_SPARK,
    tables=["events"],
    tags=["compat", "quantile"],
    description=(
        "ClickHouse quantileTiming: exact < 1024 ms, 16 ms buckets to "
        "30 s, clamp above; bounded grid => grouped counts + "
        "cumulative walk (no global per-row sort), type-1 quantile"
    ),
)


# --- categoricalInformationValue --------------------------------------------------
# Category = customer nation, tag = urgent/high order priority.
# Categories with an empty good or bad cell are excluded on BOTH sides
# (ClickHouse emits nan/inf there — documented variant). 25-term
# double sum under ROUND(,6).
_CAT_IV_SPARK = """
    WITH base AS (
      SELECT n.n_name AS cat,
             CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 ELSE 0 END AS tag
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
    ),
    pc AS (
      SELECT cat,
             SUM(tag) AS good,
             SUM(1 - tag) AS bad
      FROM base GROUP BY cat
    ),
    tot AS (SELECT SUM(good) AS g, SUM(bad) AS b FROM pc)
    SELECT ROUND(SUM(
             (pc.good / CAST(t.g AS DOUBLE) - pc.bad / CAST(t.b AS DOUBLE))
             * LN((pc.good / CAST(t.g AS DOUBLE))
                  / (pc.bad / CAST(t.b AS DOUBLE)))
           ), 6) AS information_value,
           COUNT(*) AS n_cats,
           CAST(MIN(t.g) AS BIGINT) AS good_total,
           CAST(MIN(t.b) AS BIGINT) AS bad_total
    FROM pc CROSS JOIN tot t
    WHERE pc.good > 0 AND pc.bad > 0
"""

REGISTRY.sql_query(
    "agg_categorical_iv",
    _CAT_IV_SPARK,
    oracle=_CAT_IV_SPARK,
    tables=["orders", "customer", "nation"],
    tags=["compat", "stats", "agg"],
    description=(
        "ClickHouse categoricalInformationValue: per-nation "
        "(p_good - p_bad) * ln(p_good/p_bad) summed; empty cells "
        "excluded both sides, ROUND(,6) guard"
    ),
)


# --- numbers() + deterministic generateRandom ------------------------------------
# Spark's range() TVF vs DuckDB's range() TVF; the 31-bit LCG stands
# in for generateRandom so both engines derive the identical column
# without touching either engine's RNG (id*1103515245 stays < 2^57 —
# no BIGINT wrap).
_NUMBERS_LCG_SPARK = """
    WITH nums AS (SELECT id FROM range(0, 100000)),
    r AS (
      SELECT id, (id * 1103515245 + 12345) % 2147483648 AS v FROM nums
    )
    SELECT COUNT(*) AS n,
           CAST(SUM(v) AS BIGINT) AS sum_v,
           MIN(v) AS min_v,
           MAX(v) AS max_v,
           CAST(SUM(CASE WHEN v % 10 = 3 THEN 1 ELSE 0 END) AS BIGINT)
             AS bucket3
    FROM r
"""

_NUMBERS_LCG_ORACLE = """
    WITH nums AS (SELECT range AS id FROM range(0, 100000)),
    r AS (
      SELECT id, (id * 1103515245 + 12345) % 2147483648 AS v FROM nums
    )
    SELECT COUNT(*) AS n,
           CAST(SUM(v) AS BIGINT) AS sum_v,
           MIN(v) AS min_v,
           MAX(v) AS max_v,
           CAST(SUM(CASE WHEN v % 10 = 3 THEN 1 ELSE 0 END) AS BIGINT)
             AS bucket3
    FROM r
"""

REGISTRY.sql_query(
    "tf_numbers_lcg",
    _NUMBERS_LCG_SPARK,
    oracle=_NUMBERS_LCG_ORACLE,
    # no source tables — region (5 rows) is the cheapest stamp for the
    # loader, which treats an empty list as "all tables"
    tables=["region"],
    tags=["compat", "table-function"],
    description=(
        "ClickHouse numbers(N) + deterministic generateRandom "
        "analogue: range() TVF on both engines, 31-bit LCG column, "
        "exact aggregate fingerprint"
    ),
)
