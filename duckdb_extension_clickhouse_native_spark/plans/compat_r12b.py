"""Round-12 second compatibility tranche: remaining ClickHouse
aggregate/scalar signatures plus the binary-embedding retrieval tier.

* ``retention(cond1, ..., condN)`` — the ClickHouse funnel-adjacent
  aggregate (docs: sql-reference/aggregate-functions/parametric-functions):
  per user, flag 1 is "cond1 ever held"; flag i is "cond1 ever held AND
  cond_i ever held".  Summed across users it is the retention curve.
  Exact integers end to end.
* ``theilsU`` — the uncertainty coefficient U(X|Y) (ClickHouse
  cramersV/theilsU family).  Spark computes H(X) and H(X|Y) as explicit
  -sum(p*log2 p) folds; the oracle uses DuckDB's ``entropy()`` aggregate
  (structurally independent).  Log base cancels in the ratio; a single
  ROUND(,6) guards the libm tail, the same contract as
  ``agg_entropy_events`` (ROUND 9 there, ratio-of-logs here).
* ``analysisOfVariance`` (one-way ANOVA F) — exact BIGINT cents moments
  per group, then one fused double expression for F and eta-squared,
  ROUND(,6)-guarded.
* ``formatReadableSize`` / ``formatReadableTimeDelta`` — mantissas by
  BIGINT floor-division (never ROUND on an inexact double), so the
  rendered strings are exact in both engines.  ClickHouse rounds
  half-even at 2 decimals; we document floor-at-2-decimals as the
  deterministic variant.
* range_hashed dictionary lookup (``dictGetOrDefault`` over a
  date-range layout) — the third dictionary layout after hashed
  (``dict_get_region``) and hierarchical (``dict_hierarchy_nation``).
  Spark side is a broadcast range join; ranges are derived
  deterministically from ``nation`` so both engines build the same dim.
* Flesch-Kincaid-style readability signals — deterministic vowel-group
  syllable counting (regexp_count vs len(regexp_extract_all):
  independent engines, exact integer counts), pseudo-sentences of 12
  words since the synthetic corpus has no terminal punctuation
  (documented variant), grade from one fused double expression.
* 1-bit binary-quantized embedding retrieval — sign-bit packing into
  two BIGINT halves (32 bits each; a single 64-bit word would overflow
  the BIGINT sign bit at shift 63), Hamming scoring via
  bit_count(xor), exact across engines; ``sim_binary_recall`` grades
  recall@10 against the exact-cosine ranking the same way
  ``sim_int8_recall`` grades the int8 tier.

Determinism rules follow base.py: integer cents via FLOOR(value*100),
exact BIGINT sums, single fused double expressions where a ratio must
cross engines, ROUND() only on already-deterministic doubles or as a
documented libm guard.
"""

from __future__ import annotations

from .base import REGISTRY

_CENTS = "CAST(FLOOR(value * 100) AS BIGINT)"


# --- retention() -------------------------------------------------------------
# ClickHouse: retention(cond1, cond2, cond3) returns per-row-group an
# array r where r[1] = max(cond1) and r[i] = max(cond1) AND max(cond_i).
# The canonical report sums the flags across users.  cond1 = "user
# signed up", cond_i = "user was active in hour-of-day band i".  One
# hash aggregation per user, then one global sum — two shuffles, the
# second over one row per user.
_RETENTION_SPARK = """
    WITH per_user AS (
      SELECT user_id,
             MAX(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS c1,
             MAX(CASE WHEN event_type IN ('click', 'view')
                       AND hour(ts) BETWEEN 0 AND 7 THEN 1 ELSE 0 END) AS c2,
             MAX(CASE WHEN event_type IN ('click', 'view')
                       AND hour(ts) BETWEEN 8 AND 15 THEN 1 ELSE 0 END) AS c3,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS c4
      FROM events
      GROUP BY user_id
    )
    SELECT CAST(SUM(c1) AS BIGINT) AS r1,
           CAST(SUM(c1 * c2) AS BIGINT) AS r2,
           CAST(SUM(c1 * c3) AS BIGINT) AS r3,
           CAST(SUM(c1 * c4) AS BIGINT) AS r4,
           COUNT(*) AS n_users
    FROM per_user
"""

REGISTRY.sql_query(
    "events_retention_matrix",
    _RETENTION_SPARK,
    oracle=_RETENTION_SPARK,
    tables=["events"],
    tags=["compat", "agg", "retention", "funnel"],
    description=(
        "ClickHouse retention(cond1..cond4): per-user condition flags "
        "(r_i = cond1 AND cond_i), summed into the retention curve; "
        "exact integers, one per-user aggregation + one global sum"
    ),
)


# --- theilsU ------------------------------------------------------------------
# U(X|Y) = (H(X) - H(X|Y)) / H(X).  Spark: explicit -sum(p*log2 p)
# folds over grouped counts.  Oracle: DuckDB's entropy() aggregate with
# the conditional term as a weighted per-Y mean — structurally
# independent formulations; base-2 cancels in the ratio.
_THEILS_SPARK = """
    WITH base AS (
      SELECT event_type AS x, CAST(hour(ts) AS BIGINT) % 6 AS y FROM events
    ),
    cx AS (SELECT x, COUNT(*) AS cnt FROM base GROUP BY x),
    n AS (SELECT SUM(cnt) AS n FROM cx),
    hx AS (
      SELECT -SUM((cnt / CAST(n.n AS DOUBLE))
                  * LOG2(cnt / CAST(n.n AS DOUBLE))) AS h
      FROM cx CROSS JOIN n
    ),
    cxy AS (SELECT y, x, COUNT(*) AS cnt FROM base GROUP BY y, x),
    cy AS (SELECT y, SUM(cnt) AS cnt_y FROM cxy GROUP BY y),
    hxy AS (
      SELECT SUM(-(cxy.cnt / CAST(cy.cnt_y AS DOUBLE))
                 * LOG2(cxy.cnt / CAST(cy.cnt_y AS DOUBLE))
                 * (cy.cnt_y / CAST(n.n AS DOUBLE))) AS h
      FROM cxy JOIN cy ON cxy.y = cy.y CROSS JOIN n
    )
    SELECT ROUND((hx.h - hxy.h) / hx.h, 6) AS theils_u,
           ROUND(hx.h, 6) AS h_x,
           CAST(n.n AS BIGINT) AS n_rows
    FROM hx CROSS JOIN hxy CROSS JOIN n
"""

_THEILS_ORACLE = """
    WITH base AS (
      SELECT event_type AS x, CAST(hour(ts) AS BIGINT) % 6 AS y FROM events
    ),
    hx AS (SELECT entropy(x) AS h FROM base),
    hxy AS (
      SELECT SUM(cnt_y * ent_y) / SUM(cnt_y) AS h
      FROM (SELECT y, COUNT(*) AS cnt_y, entropy(x) AS ent_y
            FROM base GROUP BY y)
    )
    SELECT ROUND((hx.h - hxy.h) / hx.h, 6) AS theils_u,
           ROUND(hx.h, 6) AS h_x,
           (SELECT COUNT(*) FROM base) AS n_rows
    FROM hx CROSS JOIN hxy
"""

REGISTRY.sql_query(
    "stats_theils_u",
    _THEILS_SPARK,
    oracle=_THEILS_ORACLE,
    tables=["events"],
    tags=["compat", "stats", "association", "entropy"],
    description=(
        "theilsU uncertainty coefficient U(event_type | hour band): "
        "explicit -sum(p*log2 p) folds vs DuckDB's entropy() aggregate "
        "(independent formulations; log base cancels in the ratio)"
    ),
)


# --- analysisOfVariance (one-way ANOVA) --------------------------------------
# Per-group exact BIGINT moments (n, sum, sum-of-squares over integer
# cents), then F and eta^2 from ONE fused double expression each —
# identical IEEE evaluation order both sides, ROUND(,6) as the guard.
_ANOVA_SQL = f"""
    WITH g AS (
      SELECT event_type, COUNT(*) AS n,
             SUM({_CENTS}) AS s,
             SUM({_CENTS} * {_CENTS}) AS ss
      FROM events GROUP BY event_type
    ),
    gs AS (SELECT SUM(CAST(s AS DOUBLE) * s / n) AS between_raw FROM g),
    tot AS (SELECT SUM(n) AS n, SUM(s) AS s, SUM(ss) AS ss,
                   COUNT(*) AS k FROM g)
    SELECT CAST(tot.k AS BIGINT) AS k_groups,
           CAST(tot.n AS BIGINT) AS n_rows,
           ROUND(((gs.between_raw - CAST(tot.s AS DOUBLE) * tot.s / tot.n)
                   / (tot.k - 1))
                 / ((tot.ss - gs.between_raw) / (tot.n - tot.k)), 6) AS f_stat,
           ROUND((gs.between_raw - CAST(tot.s AS DOUBLE) * tot.s / tot.n)
                 / (tot.ss - CAST(tot.s AS DOUBLE) * tot.s / tot.n), 6)
             AS eta_sq
    FROM tot CROSS JOIN gs
"""

REGISTRY.sql_query(
    "stats_anova_f",
    _ANOVA_SQL,
    oracle=_ANOVA_SQL,
    tables=["events"],
    tags=["compat", "stats", "anova"],
    description=(
        "analysisOfVariance (one-way ANOVA over value cents by "
        "event_type): exact BIGINT group moments, F and eta-squared "
        "from fused double expressions, ROUND(,6) guard"
    ),
)


# --- formatReadableSize / formatReadableTimeDelta -----------------------------
# Mantissa = (bytes*100) DIV 1024^k — BIGINT floor division, no double
# anywhere, so the rendered string is bit-identical across engines.
# ClickHouse rounds half-even where we floor: documented variant.
def _readable_size(col: str, div: str) -> str:
    # div: Spark "DIV", DuckDB "//"
    return f"""
      CASE
        WHEN {col} < 1024 THEN CONCAT(CAST({col} AS STRING), ' B')
        WHEN {col} < 1048576 THEN CONCAT(
          CAST(({col} * 100) {div} 1024 {div} 100 AS STRING), '.',
          LPAD(CAST(({col} * 100) {div} 1024 % 100 AS STRING), 2, '0'),
          ' KiB')
        WHEN {col} < 1073741824 THEN CONCAT(
          CAST(({col} * 100) {div} 1048576 {div} 100 AS STRING), '.',
          LPAD(CAST(({col} * 100) {div} 1048576 % 100 AS STRING), 2, '0'),
          ' MiB')
        ELSE CONCAT(
          CAST(({col} * 100) {div} 1073741824 {div} 100 AS STRING), '.',
          LPAD(CAST(({col} * 100) {div} 1073741824 % 100 AS STRING), 2, '0'),
          ' GiB')
      END
    """


def _readable_delta(col: str, div: str) -> str:
    return f"""
      CONCAT(CAST({col} {div} 86400 AS STRING), ' days ',
             CAST({col} % 86400 {div} 3600 AS STRING), ' hours ',
             CAST({col} % 3600 {div} 60 AS STRING), ' minutes ',
             CAST({col} % 60 AS STRING), ' seconds')
    """


def _format_readable_sql(div: str) -> str:
    bytes_expr = "CAST(o_totalprice * 100 AS BIGINT)"
    secs_expr = "CAST(o_orderkey AS BIGINT)"
    return f"""
      SELECT o_orderkey,
             {_readable_size(bytes_expr, div)} AS readable_size,
             {_readable_delta(secs_expr, div)} AS readable_delta
      FROM orders
      WHERE o_orderkey % 997 = 0
      ORDER BY o_orderkey
    """


REGISTRY.sql_query(
    "scalar_format_readable",
    _format_readable_sql("DIV"),
    oracle=_format_readable_sql("//"),
    tables=["orders"],
    tags=["compat", "scalar", "format"],
    description=(
        "formatReadableSize/formatReadableTimeDelta: B/KiB/MiB/GiB "
        "rendering with BIGINT floor-division mantissas (exact strings "
        "both engines; ClickHouse half-even rounding -> documented "
        "floor variant) and days/hours/minutes/seconds decomposition"
    ),
)


# --- range_hashed dictionary --------------------------------------------------
# ClickHouse range_hashed layout: lookup key + a date, value comes from
# the row whose [range_min, range_max] contains the date;
# dictGetOrDefault supplies the miss value.  The ranges dim is derived
# deterministically from `nation` (25 keys x 3 non-overlapping yearly
# bands) so both engines construct the identical dictionary.  Spark
# executes it as a broadcast range join — the dictionary is tiny by
# contract, exactly ClickHouse's in-memory layout assumption.
def _range_dict_sql() -> str:
    return """
      WITH bands AS (
        SELECT n_nationkey AS key,
               CAST(CONCAT(CAST(1993 + b.band AS STRING), '-01-01') AS DATE)
                 AS range_min,
               CAST(CONCAT(CAST(1993 + b.band AS STRING), '-12-31') AS DATE)
                 AS range_max,
               CAST((n_nationkey * 7 + b.band * 13) % 50 + 10 AS BIGINT)
                 AS rate_bp
        FROM nation
        CROSS JOIN (SELECT 0 AS band UNION ALL SELECT 1
                    UNION ALL SELECT 2) b
      ),
      looked AS (
        SELECT o.o_orderkey,
               c.c_nationkey,
               COALESCE(bands.rate_bp, CAST(5 AS BIGINT)) AS rate_bp,
               CAST(FLOOR(o.o_totalprice * 100) AS BIGINT) AS cents
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        LEFT JOIN bands
          ON bands.key = c.c_nationkey
         AND o.o_orderdate BETWEEN bands.range_min AND bands.range_max
      )
      SELECT c_nationkey,
             CAST(SUM(rate_bp * cents) AS BIGINT) AS weighted_cents_bp,
             CAST(SUM(CASE WHEN rate_bp = 5 THEN 1 ELSE 0 END) AS BIGINT)
               AS default_hits,
             COUNT(*) AS n_orders
      FROM looked
      GROUP BY c_nationkey
      ORDER BY c_nationkey
    """


REGISTRY.sql_query(
    "dict_range_lookup",
    _range_dict_sql(),
    oracle=_range_dict_sql(),
    tables=["orders", "customer", "nation"],
    tags=["compat", "dictionary", "range_hashed", "broadcast"],
    description=(
        "range_hashed dictionary dictGetOrDefault: (nationkey, "
        "orderdate) -> rate from the covering yearly band, default on "
        "miss; Spark plans the tiny dim as a broadcast range join"
    ),
)


# --- readability signals -------------------------------------------------------
# Deterministic Flesch-Kincaid-style grade: words and vowel-group
# "syllables" are exact integer counts (Spark regexp_count vs DuckDB
# len(regexp_extract_all) — independent regex engines over the same
# POSIX class pattern), pseudo-sentences of 12 words because the
# synthetic corpus has no terminal punctuation (documented variant).
# grade emitted as FLOOR(grade * 1e4) BIGINT: the inputs are integer-
# derived doubles and every op is IEEE-deterministic, so the scaled
# double is bit-identical across engines and FLOOR has no tie to
# disagree on.  (ROUND(,4) was NOT safe: grades like 7.98125 tie at
# the 5th decimal and Spark's HALF_UP-on-exact-binary disagrees with
# DuckDB's scaled-nearbyint — caught by the sf0.1 sweep.)
_FK = (
    "CAST(FLOOR((0.39 * (words / CAST(sentences AS DOUBLE)) "
    "+ 11.8 * (syll / CAST(words AS DOUBLE)) - 15.59) * 10000) AS BIGINT)"
)

_READABILITY_SPARK = f"""
    WITH counted AS (
      SELECT doc_id,
             CAST(regexp_count(text, '[a-z]+') AS BIGINT) AS words,
             CAST(regexp_count(text, '[aeiouy]+') AS BIGINT) AS syll
      FROM documents
    ),
    sent AS (
      SELECT doc_id, words, syll,
             GREATEST(CAST(1 AS BIGINT), words DIV 12) AS sentences
      FROM counted
      WHERE words > 0
    )
    SELECT doc_id, words, syll, sentences,
           {_FK} AS fk_grade_e4
    FROM sent
    WHERE doc_id % 17 = 0
    ORDER BY doc_id
"""

_READABILITY_ORACLE = f"""
    WITH counted AS (
      SELECT doc_id,
             CAST(len(regexp_extract_all(text, '[a-z]+')) AS BIGINT) AS words,
             CAST(len(regexp_extract_all(text, '[aeiouy]+')) AS BIGINT) AS syll
      FROM documents
    ),
    sent AS (
      SELECT doc_id, words, syll,
             GREATEST(CAST(1 AS BIGINT), words // 12) AS sentences
      FROM counted
      WHERE words > 0
    )
    SELECT doc_id, words, syll, sentences,
           {_FK} AS fk_grade_e4
    FROM sent
    WHERE doc_id % 17 = 0
    ORDER BY doc_id
"""

REGISTRY.sql_query(
    "text_readability",
    _READABILITY_SPARK,
    oracle=_READABILITY_ORACLE,
    tables=["documents"],
    tags=["text", "quality", "pipeline"],
    description=(
        "Flesch-Kincaid-style readability: exact word / vowel-group "
        "syllable counts (regexp_count vs regexp_extract_all), "
        "12-word pseudo-sentences, grade as a tie-free e4 scaled integer"
    ),
)


# --- 1-bit binary embedding retrieval ------------------------------------------
# Sign-bit quantization packs each 64-dim vector into two BIGINTs (32
# bits per word keeps every shift below the BIGINT sign bit).  Hamming
# distance = bit_count(xor) + bit_count(xor): pure integer ops, exact
# in both engines.  At scale the packed corpus is 8 bytes x 2 per
# vector (32x smaller than float32), the scoring loop is two XOR+POPCNT
# per candidate inside whole-stage codegen, and the top-k is
# TakeOrderedAndProject — no shuffle beyond the final k rows.
_BINARY_PACK_SPARK = """
      SELECT vec_id,
             aggregate(sequence(0, 31), CAST(0 AS BIGINT),
               (acc, i) -> acc + CASE WHEN element_at(embedding, i + 1) > 0
                                      THEN shiftleft(CAST(1 AS BIGINT), i)
                                      ELSE CAST(0 AS BIGINT) END) AS h1,
             aggregate(sequence(0, 31), CAST(0 AS BIGINT),
               (acc, i) -> acc + CASE WHEN element_at(embedding, i + 33) > 0
                                      THEN shiftleft(CAST(1 AS BIGINT), i)
                                      ELSE CAST(0 AS BIGINT) END) AS h2
      FROM embeddings
"""

_BINARY_PACK_DUCK = """
      SELECT vec_id,
             CAST(list_sum(list_transform(range(32),
               i -> CASE WHEN embedding[i + 1] > 0
                         THEN 1 << i ELSE 0 END)) AS BIGINT) AS h1,
             CAST(list_sum(list_transform(range(32),
               i -> CASE WHEN embedding[i + 33] > 0
                         THEN 1 << i ELSE 0 END)) AS BIGINT) AS h2
      FROM embeddings
"""

_BINARY_TOPK_SPARK = f"""
    WITH packed AS ({_BINARY_PACK_SPARK}),
    queries AS (SELECT * FROM packed WHERE vec_id < 5),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
             CAST(bit_count(q.h1 ^ c.h1) + bit_count(q.h2 ^ c.h2) AS BIGINT)
               AS hamming
      FROM queries q JOIN packed c ON c.vec_id <> q.vec_id
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY hamming, cand_id) AS rk
      FROM scored
    )
    SELECT query_id, cand_id, hamming, CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= 10
    ORDER BY query_id, rk
"""

_BINARY_TOPK_DUCK = f"""
    WITH packed AS ({_BINARY_PACK_DUCK}),
    queries AS (SELECT * FROM packed WHERE vec_id < 5),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
             CAST(bit_count(xor(q.h1, c.h1)) + bit_count(xor(q.h2, c.h2))
                  AS BIGINT) AS hamming
      FROM queries q JOIN packed c ON c.vec_id <> q.vec_id
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY hamming, cand_id) AS rk
      FROM scored
    )
    SELECT query_id, cand_id, hamming, CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= 10
    ORDER BY query_id, rk
"""

REGISTRY.sql_query(
    "sim_topk_binary",
    _BINARY_TOPK_SPARK,
    oracle=_BINARY_TOPK_DUCK,
    tables=["embeddings"],
    tags=["similarity", "binary", "hamming", "pipeline"],
    description=(
        "1-bit binary-quantized top-10: sign bits packed into two "
        "BIGINT halves, Hamming = bit_count(xor)+bit_count(xor), "
        "deterministic (hamming, cand_id) tie-break — the 32x-"
        "compressed retrieval tier below int8"
    ),
)


# recall@10 of the binary tier against the exact fixed-point cosine
# ranking (the sim_int8_recall contract: integer e6 scores, BIGINT dot
# products, same tie-break).  Embeddings are zero-mean floats, so the
# exact ranking uses scaled-integer dot products like sim_topk_int8.
def _exact_topk(engine: str) -> str:
    if engine == "spark":
        q = """
          SELECT vec_id,
                 transform(embedding,
                           x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS e6
          FROM embeddings
        """
        dot = (
            "aggregate(zip_with(q.e6, c.e6, (a, b) -> a * b), "
            "CAST(0 AS BIGINT), (acc, x) -> acc + x)"
        )
    else:
        q = """
          SELECT vec_id,
                 list_transform(embedding,
                                x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS e6
          FROM embeddings
        """
        dot = (
            "list_sum(list_transform(range(64), "
            "i -> q.e6[i + 1] * c.e6[i + 1]))"
        )
    return f"""
      WITH e AS ({q}),
      queries AS (SELECT * FROM e WHERE vec_id < 5),
      scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
               CAST({dot} AS BIGINT) AS dot
        FROM queries q JOIN e c ON c.vec_id <> q.vec_id
      ),
      ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY dot DESC, cand_id) AS rk
        FROM scored
      )
      SELECT query_id, cand_id FROM ranked WHERE rk <= 10
    """


def _binary_recall_sql(engine: str) -> str:
    topk = _BINARY_TOPK_SPARK if engine == "spark" else _BINARY_TOPK_DUCK
    return f"""
      WITH exact_k AS ({_exact_topk(engine)}),
      binary_k AS (SELECT query_id, cand_id FROM ({topk})),
      hits AS (
        SELECT e.query_id,
               CAST(COUNT(b.cand_id) AS BIGINT) AS n_hits
        FROM exact_k e
        LEFT JOIN binary_k b
          ON e.query_id = b.query_id AND e.cand_id = b.cand_id
        GROUP BY e.query_id
      )
      SELECT query_id, n_hits,
             CAST(n_hits >= 3 AS BOOLEAN) AS recall_ok
      FROM hits
      ORDER BY query_id
    """


REGISTRY.sql_query(
    "sim_binary_recall",
    _binary_recall_sql("spark"),
    oracle=_binary_recall_sql("duck"),
    tables=["embeddings"],
    tags=["similarity", "binary", "recall"],
    description=(
        "recall@10 of the 1-bit Hamming tier vs the exact fixed-point "
        "cosine ranking (sim_int8_recall contract); bounded-error "
        "boolean per query with the raw hit count alongside"
    ),
)


# --- SELECT * REPLACE / COLUMNS(regex) APPLY modifiers ------------------------
# ClickHouse's remaining projection modifiers after r10's EXCEPT entry:
# ``* REPLACE (expr AS col)`` substitutes expressions IN PLACE (column
# order preserved — the semantic the desugar must keep), and
# ``COLUMNS('regex') APPLY (fn)`` selects by name-regex and applies an
# aggregate.  Spark has neither surface syntax, so the helpers below
# desugar generically from the DataFrame schema — the same rewrite
# ClickHouse's analyzer performs; DuckDB's native ``* REPLACE``
# spelling drives the oracle for the first, an explicit projection for
# the second.
def _select_replace(spark, sf_dir):
    from pyspark.sql import functions as F

    from .base import load_tables

    tabs = load_tables(spark, sf_dir, ["events"])
    df = tabs["events"].where("event_id < 300")
    replace = {
        "value": F.floor(F.col("value") * 100).cast("bigint"),
        "event_type": F.upper(F.col("event_type")),
    }
    except_ = {"props", "ts"}
    cols = [
        (replace[c] if c in replace else F.col(c)).alias(c)
        for c in df.columns
        if c not in except_
    ]
    return df.select(*cols).orderBy("event_id")


REGISTRY.df_query(
    "select_replace_modifier",
    _select_replace,
    oracle="""
    SELECT * EXCLUDE (props, ts)
           REPLACE (CAST(FLOOR(value * 100) AS BIGINT) AS value,
                    upper(event_type) AS event_type)
    FROM events
    WHERE event_id < 300
    ORDER BY event_id
    """,
    tags=["compat", "projection", "sugar"],
    description="ClickHouse SELECT * REPLACE (expr AS col): generic "
    "schema-driven desugar preserving column order vs DuckDB's native "
    "REPLACE spelling",
)


def _columns_apply(spark, sf_dir):
    import re as _re

    from pyspark.sql import functions as F

    from .base import load_tables

    tabs = load_tables(spark, sf_dir, ["events"])
    df = tabs["events"]
    pat = _re.compile(r"(event|user)_id")
    aggs = [
        F.max(c).alias(f"max_{c}") for c in df.columns if pat.fullmatch(c)
    ]
    if not aggs:
        raise ValueError("COLUMNS regex matched nothing")
    return df.agg(*aggs)


REGISTRY.df_query(
    "select_columns_apply",
    _columns_apply,
    oracle="""
    SELECT MAX(event_id) AS max_event_id,
           MAX(user_id) AS max_user_id
    FROM events
    """,
    tags=["compat", "projection", "sugar", "agg"],
    description="ClickHouse COLUMNS('regex') APPLY (max): name-regex "
    "column selection with an applied aggregate, desugared from the "
    "DataFrame schema",
)


# --- retrieval cascade: binary shortlist -> exact re-rank ---------------------
# The production serving pattern the binary tier exists for: a cheap
# 1-bit Hamming pass shortlists top-100 candidates per query (32x
# smaller index, XOR+POPCNT scoring), then ONLY the shortlist pays the
# exact fixed-point cosine re-rank for the final top-10.  At corpus
# scale the expensive scoring touches 100 rows per query instead of
# the corpus; the cascade is fully deterministic (both stages break
# ties on cand_id), so the oracle runs the same two stages and the
# hash certifies the composition end to end.  sim_binary_recall
# (registered above) is the measured recall of the shortlist tier
# against the exact ranking.
_CASCADE_SHORTLIST = 100


def _cascade_sql(engine: str) -> str:
    pack = _BINARY_PACK_SPARK if engine == "spark" else _BINARY_PACK_DUCK
    if engine == "spark":
        e6 = """
          SELECT vec_id,
                 transform(embedding,
                           x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS e6
          FROM embeddings
        """
        dot = (
            "aggregate(zip_with(q.e6, c.e6, (a, b) -> a * b), "
            "CAST(0 AS BIGINT), (acc, x) -> acc + x)"
        )
        ham = "bit_count(qb.h1 ^ cb.h1) + bit_count(qb.h2 ^ cb.h2)"
    else:
        e6 = """
          SELECT vec_id,
                 list_transform(embedding,
                                x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS e6
          FROM embeddings
        """
        dot = (
            "list_sum(list_transform(range(64), "
            "i -> q.e6[i + 1] * c.e6[i + 1]))"
        )
        ham = (
            "bit_count(xor(qb.h1, cb.h1)) + bit_count(xor(qb.h2, cb.h2))"
        )
    return f"""
    WITH packed AS ({pack}),
    qb_all AS (SELECT * FROM packed WHERE vec_id < 5),
    shortlist AS (
      SELECT query_id, cand_id FROM (
        SELECT qb.vec_id AS query_id, cb.vec_id AS cand_id,
               ROW_NUMBER() OVER (
                 PARTITION BY qb.vec_id
                 ORDER BY {ham}, cb.vec_id) AS rk
        FROM qb_all qb JOIN packed cb ON cb.vec_id <> qb.vec_id
      ) WHERE rk <= {_CASCADE_SHORTLIST}
    ),
    e AS ({e6}),
    reranked AS (
      SELECT s.query_id, s.cand_id,
             CAST({dot} AS BIGINT) AS dot,
             ROW_NUMBER() OVER (
               PARTITION BY s.query_id
               ORDER BY CAST({dot} AS BIGINT) DESC, s.cand_id) AS rk
      FROM shortlist s
      JOIN e q ON q.vec_id = s.query_id
      JOIN e c ON c.vec_id = s.cand_id
    )
    SELECT query_id, cand_id, dot, CAST(rk AS BIGINT) AS rk
    FROM reranked WHERE rk <= 10
    ORDER BY query_id, rk
    """


REGISTRY.sql_query(
    "sim_cascade_topk",
    _cascade_sql("spark"),
    oracle=_cascade_sql("duck"),
    tables=["embeddings"],
    tags=["similarity", "binary", "cascade", "pipeline", "scale"],
    description=(
        "retrieval cascade: 1-bit Hamming shortlist (top-100, XOR+"
        "POPCNT over packed BIGINTs) -> exact fixed-point cosine "
        "re-rank of ONLY the shortlist -> top-10; deterministic "
        "tie-breaks make the whole composition hash-checkable"
    ),
)


# --- query result cache --------------------------------------------------------
# ClickHouse use_query_cache (operations/query-cache): TTL-valid result
# reuse keyed on the canonicalized plan.  The graded entry runs the
# aggregation twice THROUGH the cache — the second call must be a hit
# (asserted) and the SERVED bytes (a Native scan of the stored result)
# must hash-match the plain-SQL oracle: the round-trip through the
# cache storage path is what the driver certifies.
def _query_cache_roundtrip(spark, sf_dir):
    import tempfile
    import uuid

    from pyspark.sql import functions as F

    from .base import load_tables
    from ..operators.querycache import cached_query

    tabs = load_tables(spark, sf_dir, ["events"])
    q = (
        tabs["events"]
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.floor(F.col("value") * 100).cast("bigint")).alias(
                "sum_cents"
            ),
        )
        .orderBy("event_type")
    )
    cache_dir = tempfile.mkdtemp(prefix=f"qcache_entry_{uuid.uuid4().hex[:8]}_")
    clock = [1000.0]
    _r1, hit1 = cached_query(
        spark, q, cache_dir=cache_dir, now_fn=lambda: clock[0]
    )
    clock[0] += 5.0
    r2, hit2 = cached_query(
        spark, q, cache_dir=cache_dir, now_fn=lambda: clock[0]
    )
    if hit1 or not hit2:
        raise AssertionError(
            f"query cache semantics regressed: first call hit={hit1} "
            f"(want miss), second hit={hit2} (want hit)"
        )
    return r2


REGISTRY.df_query(
    "query_cache_roundtrip",
    _query_cache_roundtrip,
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT)
             AS sum_cents
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=["compat", "cache", "storage"],
    description="use_query_cache TTL semantics: miss-then-hit asserted, "
    "the hit-served Native-stored result hash-matches the plain oracle",
)
