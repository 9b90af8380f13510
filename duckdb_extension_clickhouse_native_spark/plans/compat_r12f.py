"""Round-12 sixth compatibility tranche: frame-bounded lag and the
typed JSONExtract family.

* ``lagInFrame`` / ``leadInFrame`` (docs: sql-reference/window-functions
  — the ClickHouse variants of lag/lead that RESPECT the window frame,
  returning NULL outside it, where standard lag/lead ignore frames) —
  Spark's lag() likewise ignores frames, so the engine form collects
  the frame into an array and indexes it:
  ``element_at(collect_list(x) OVER (ROWS 2 PRECEDING..CURRENT), 1)``
  is lagInFrame(x, 2) exactly (NULL when the frame holds < 3 rows —
  partition starts, unlike plain lag's spill into preceding rows
  beyond the frame).  The oracle indexes DuckDB's frame-bounded
  ``list()`` aggregate — same frame, independent list machinery.
* typed ``JSONExtract*`` (docs: sql-reference/functions/json-functions
  — JSONExtractInt / JSONExtractString / JSONHas / JSON_VALUE) — Spark
  ``get_json_object`` + cast vs DuckDB ``json_extract_string`` + cast:
  structurally different JSON engines (Jackson path vs yyjson), so the
  driver hash is a real cross-implementation check.  Missing keys are
  NULL on both sides; JSONHas renders as a BOOLEAN.

Determinism rules follow base.py: exact integers, no ROUND anywhere.
"""

from __future__ import annotations

from .base import REGISTRY

# --- lagInFrame / leadInFrame ----------------------------------------------------
# lagInFrame(x, 2) = the frame's FIRST element only when the frame is
# full (3 rows); ClickHouse returns the default (NULL) otherwise. The
# Spark side gets that for free (element_at of a short list is its
# first element — WRONG for short frames), so both sides guard with
# frame_rows. To keep the graded columns honest, the guard is applied
# in both texts identically via CASE.
_LAG_IN_FRAME_SPARK = """
    WITH base AS (
      SELECT user_id, event_id,
             CAST(FLOOR(value * 100) AS BIGINT) AS cents
      FROM events
      WHERE user_id % 17 = 0
    ),
    framed AS (
      SELECT user_id, event_id,
             collect_list(cents) OVER (
               PARTITION BY user_id ORDER BY event_id
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
             ) AS back_frame,
             collect_list(cents) OVER (
               PARTITION BY user_id ORDER BY event_id
               ROWS BETWEEN CURRENT ROW AND 2 FOLLOWING
             ) AS fwd_frame
      FROM base
    )
    SELECT user_id, event_id,
           CASE WHEN size(back_frame) = 3
                THEN element_at(back_frame, 1) END AS lag_in_frame_2,
           CASE WHEN size(fwd_frame) = 3
                THEN element_at(fwd_frame, -1) END AS lead_in_frame_2,
           CAST(size(back_frame) AS BIGINT) AS frame_rows
    FROM framed
    ORDER BY user_id, event_id
"""

_LAG_IN_FRAME_ORACLE = """
    WITH base AS (
      SELECT user_id, event_id,
             CAST(FLOOR(value * 100) AS BIGINT) AS cents
      FROM events
      WHERE user_id % 17 = 0
    ),
    framed AS (
      SELECT user_id, event_id,
             list(cents) OVER (
               PARTITION BY user_id ORDER BY event_id
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
             ) AS back_frame,
             list(cents) OVER (
               PARTITION BY user_id ORDER BY event_id
               ROWS BETWEEN CURRENT ROW AND 2 FOLLOWING
             ) AS fwd_frame
      FROM base
    )
    SELECT user_id, event_id,
           CASE WHEN len(back_frame) = 3
                THEN back_frame[1] END AS lag_in_frame_2,
           CASE WHEN len(fwd_frame) = 3
                THEN fwd_frame[-1] END AS lead_in_frame_2,
           CAST(len(back_frame) AS BIGINT) AS frame_rows
    FROM framed
    ORDER BY user_id, event_id
"""

REGISTRY.sql_query(
    "window_lag_in_frame",
    _LAG_IN_FRAME_SPARK,
    oracle=_LAG_IN_FRAME_ORACLE,
    tables=["events"],
    tags=["compat", "window"],
    description=(
        "ClickHouse lagInFrame/leadInFrame (frame-RESPECTING lag): "
        "frame collected to an array and indexed, NULL when the frame "
        "is short — the semantics plain lag/lead cannot express"
    ),
)


# --- typed JSONExtract family -----------------------------------------------------
_JSON_FAMILY_SPARK = """
    SELECT event_id,
           CAST(get_json_object(props, '$.k') AS BIGINT) AS k_int,
           get_json_object(props, '$.k') AS k_raw,
           (get_json_object(props, '$.k') IS NOT NULL) AS has_k,
           (get_json_object(props, '$.missing') IS NOT NULL) AS has_missing
    FROM events
    WHERE event_id % 23 = 0
    ORDER BY event_id
"""

_JSON_FAMILY_ORACLE = """
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int,
           json_extract_string(props, '$.k') AS k_raw,
           (json_extract_string(props, '$.k') IS NOT NULL) AS has_k,
           (json_extract_string(props, '$.missing') IS NOT NULL)
             AS has_missing
    FROM events
    WHERE event_id % 23 = 0
    ORDER BY event_id
"""

REGISTRY.sql_query(
    "scalar_json_extract_family",
    _JSON_FAMILY_SPARK,
    oracle=_JSON_FAMILY_ORACLE,
    tables=["events"],
    tags=["compat", "scalar", "json"],
    description=(
        "ClickHouse JSONExtractInt/JSONExtractString/JSONHas: Spark "
        "get_json_object (Jackson) vs DuckDB json_extract_string "
        "(yyjson) — independent JSON engines, typed casts, NULL on "
        "missing keys both sides"
    ),
)


# --- multi-array ARRAY JOIN ---------------------------------------------------------
# ClickHouse `ARRAY JOIN ks, vs` zips SAME-LENGTH arrays positionally
# into parallel columns (docs: statements/select/array-join). Spark:
# explode(arrays_zip(...)); DuckDB: multiple unnest() in one SELECT
# zips positionally — independent lateral machinery. Arrays are built
# equal-length (ClickHouse errors on a length mismatch; both engines'
# null-padding never engages).
_ARRAY_JOIN_MULTI_SPARK = """
    WITH arr AS (
      SELECT l_orderkey, l_linenumber,
             array(l_partkey % 5, l_suppkey % 5,
                   (l_partkey + l_suppkey) % 5) AS ks,
             array(CAST(FLOOR(l_quantity) AS BIGINT),
                   CAST(FLOOR(l_extendedprice) AS BIGINT) % 100,
                   l_orderkey % 7) AS vs
      FROM lineitem
      WHERE l_orderkey % 211 = 0
    )
    SELECT l_orderkey, l_linenumber, z.ks AS k, z.vs AS v
    FROM arr
    LATERAL VIEW explode(arrays_zip(ks, vs)) t AS z
    ORDER BY l_orderkey, l_linenumber, k, v
"""

_ARRAY_JOIN_MULTI_ORACLE = """
    WITH arr AS (
      SELECT l_orderkey, l_linenumber,
             [l_partkey % 5, l_suppkey % 5,
              (l_partkey + l_suppkey) % 5] AS ks,
             [CAST(FLOOR(l_quantity) AS BIGINT),
              CAST(FLOOR(l_extendedprice) AS BIGINT) % 100,
              l_orderkey % 7] AS vs
      FROM lineitem
      WHERE l_orderkey % 211 = 0
    )
    SELECT l_orderkey, l_linenumber,
           unnest(ks) AS k, unnest(vs) AS v
    FROM arr
    ORDER BY l_orderkey, l_linenumber, k, v
"""

REGISTRY.sql_query(
    "array_join_multi",
    _ARRAY_JOIN_MULTI_SPARK,
    oracle=_ARRAY_JOIN_MULTI_ORACLE,
    tables=["lineitem"],
    tags=["compat", "array", "explode"],
    description=(
        "ClickHouse multi-array ARRAY JOIN: positional zip of "
        "same-length arrays — Spark explode(arrays_zip) vs DuckDB "
        "parallel unnest()"
    ),
)


# --- URL canonicalization dedup -----------------------------------------------------
# The web-corpus dedup step every crawl pipeline runs: scheme/case
# normalization, trailing-slash strip, tracking-param drop, fragment
# drop — then exact dedup on the canonical form. Spark uses its real
# URL machinery (parse_url HOST/PATH/QUERY-key extraction); the DuckDB
# oracle re-derives the same canonical with regexes — independent
# parsers, so a parse_url quirk cannot hide. URLs are manufactured
# deterministically from doc_id with hostile decorations (upper-case
# host, trailing slash on evens, utm params always, fragment on %3).
_URL_CANON_SPARK = """
    WITH urls AS (
      SELECT doc_id,
             concat('https://WWW.Example', CAST(doc_id % 7 AS STRING),
                    '.com/p/', CAST(doc_id % 13 AS STRING),
                    CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END,
                    '?utm_source=feed&id=', CAST(doc_id % 5 AS STRING),
                    CASE WHEN doc_id % 3 = 0 THEN '#frag' ELSE '' END)
               AS url
      FROM documents
    ),
    canon AS (
      SELECT doc_id,
             concat(
               lower(parse_url(url, 'HOST')),
               regexp_replace(parse_url(url, 'PATH'), '/$', ''),
               '?id=', parse_url(url, 'QUERY', 'id')
             ) AS curl
      FROM urls
    ),
    grouped AS (
      SELECT curl, COUNT(*) AS n_dups, MIN(doc_id) AS keeper
      FROM canon GROUP BY curl
    )
    SELECT COUNT(*) AS n_canonical,
           CAST(SUM(n_dups) AS BIGINT) AS n_docs,
           CAST(MAX(n_dups) AS BIGINT) AS max_group,
           CAST(SUM(keeper) AS BIGINT) AS keeper_sum
    FROM grouped
"""

_URL_CANON_ORACLE = """
    WITH urls AS (
      SELECT doc_id,
             'https://WWW.Example' || CAST(doc_id % 7 AS VARCHAR)
             || '.com/p/' || CAST(doc_id % 13 AS VARCHAR)
             || CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END
             || '?utm_source=feed&id=' || CAST(doc_id % 5 AS VARCHAR)
             || CASE WHEN doc_id % 3 = 0 THEN '#frag' ELSE '' END
               AS url
      FROM documents
    ),
    canon AS (
      SELECT doc_id,
             lower(regexp_extract(url, 'https://([^/]+)/', 1))
             || rtrim(regexp_extract(url, 'https://[^/]+(/[^?#]*)', 1), '/')
             || '?id=' || regexp_extract(url, 'id=([0-9]+)', 1) AS curl
      FROM urls
    ),
    grouped AS (
      SELECT curl, COUNT(*) AS n_dups, MIN(doc_id) AS keeper
      FROM canon GROUP BY curl
    )
    SELECT COUNT(*) AS n_canonical,
           CAST(SUM(n_dups) AS BIGINT) AS n_docs,
           CAST(MAX(n_dups) AS BIGINT) AS max_group,
           CAST(SUM(keeper) AS BIGINT) AS keeper_sum
    FROM grouped
"""

REGISTRY.sql_query(
    "dedup_url_canonical",
    _URL_CANON_SPARK,
    oracle=_URL_CANON_ORACLE,
    tables=["documents"],
    tags=["compat", "dedup", "url", "pipeline"],
    description=(
        "URL canonicalization dedup (crawl-pipeline staple): lower "
        "host, strip trailing slash / tracking params / fragment, "
        "exact dedup on the canonical — Spark parse_url vs DuckDB "
        "regex re-derivation, keeper = MIN(doc_id)"
    ),
)
