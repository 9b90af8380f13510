"""Round-12 fourth compatibility tranche: composite-key dictionaries,
positional array aggregation, filtered map sums, and the
determinator-keyed quantile.

* ``complex_key_hashed`` dictionary layout (docs: dictionaries —
  layouts ``complex_key_hashed``): ``dictGetOrDefault`` with a
  COMPOSITE (UInt64, String) key.  The fourth dictionary layout after
  hashed (``dict_get_region``), hierarchical
  (``dict_hierarchy_nation``) and range_hashed (``dict_range_lookup``);
  Spark shape: broadcast LEFT join on BOTH key columns + COALESCE.
* ``groupArrayInsertAt(default, size)(value, pos)`` (docs:
  aggregate-functions/reference/grouparrayinsertat) — a fixed-size
  per-group array with values parked at computed positions.
  ClickHouse keeps an arbitrary value on position collisions; the
  deterministic documented variant keeps MIN.  Slots render to one
  CSV string (driver-hashable, the collect_sorted_arrays precedent).
* ``sumMapFiltered(keys)(k, v)`` (docs: parametric-functions) — the
  ``events_sum_map`` shape restricted to a key whitelist; exact
  DECIMAL sums, parallel sorted arrays as CSV strings.
* ``quantileDeterministic(x, determinator)`` (docs:
  aggregate-functions/reference/quantiledeterministic) — ClickHouse
  makes reservoir sampling reproducible by seeding with a
  determinator column.  The deterministic documented variant IS its
  contract taken to the limit: an exact type-1 quantile over the
  half-sample selected by the two-round Lehmer hash of the
  determinator (writer.sample_hash_sql — the same hash the SAMPLE
  clause uses, so the subsample is engine-portable).  The quantile
  walk is grouped-counts + cumulative sum over distinct cents — no
  global per-row sort.

Determinism rules follow base.py: integer cents via FLOOR(value*100),
exact BIGINT/DECIMAL sums, CSV-serialized arrays, ROUND only as a
documented libm guard (none needed here — every output is exact).
"""

from __future__ import annotations

from ..native.writer import SAMPLE_HASH_M, sample_hash_sql
from .base import REGISTRY

# --- complex_key_hashed dictionary ---------------------------------------------
# The dim derives deterministically from nation x two fixed segments,
# so both engines build the identical dictionary; one miss arm per
# customer whose segment is outside the dictionary's domain.
_COMPLEX_KEY_SPARK = """
    WITH dim AS (
      SELECT n_nationkey AS k1, seg AS k2,
             concat(n_name, '/', seg) AS attr
      FROM nation
      CROSS JOIN (
        SELECT 'BUILDING' AS seg UNION ALL SELECT 'MACHINERY'
      ) s
    )
    SELECT /*+ BROADCAST(d) */ c.c_custkey,
           COALESCE(d.attr, 'MISS') AS dict_attr
    FROM customer c
    LEFT JOIN dim d
      ON c.c_nationkey = d.k1 AND c.c_mktsegment = d.k2
    WHERE c.c_custkey % 13 = 0
    ORDER BY c.c_custkey
"""

REGISTRY.sql_query(
    "dict_complex_key_lookup",
    _COMPLEX_KEY_SPARK,
    oracle=_COMPLEX_KEY_SPARK.replace("/*+ BROADCAST(d) */ ", ""),
    tables=["customer", "nation"],
    tags=["join", "compat", "dictionary", "broadcast"],
    description=(
        "ClickHouse complex_key_hashed dictGetOrDefault: broadcast "
        "LEFT join on a composite (UInt64, String) key with a default "
        "for out-of-domain keys — fourth dictionary layout"
    ),
)


# --- groupArrayInsertAt ----------------------------------------------------------
# Position = hour band (4 slots); collision rule MIN (deterministic
# variant of ClickHouse's 'any'); unfilled slots render the default.
_INSERT_AT_SPARK = """
    WITH pos AS (
      SELECT user_id, CAST(hour(ts) AS BIGINT) % 4 AS p,
             MIN(CAST(FLOOR(value * 100) AS BIGINT)) AS v
      FROM events
      GROUP BY user_id, CAST(hour(ts) AS BIGINT) % 4
    )
    SELECT user_id,
           concat_ws(',',
             COALESCE(CAST(MAX(CASE WHEN p = 0 THEN v END) AS STRING), '-'),
             COALESCE(CAST(MAX(CASE WHEN p = 1 THEN v END) AS STRING), '-'),
             COALESCE(CAST(MAX(CASE WHEN p = 2 THEN v END) AS STRING), '-'),
             COALESCE(CAST(MAX(CASE WHEN p = 3 THEN v END) AS STRING), '-')
           ) AS slots
    FROM pos
    GROUP BY user_id
    ORDER BY user_id
"""

REGISTRY.sql_query(
    "agg_group_array_insert_at",
    _INSERT_AT_SPARK,
    oracle=_INSERT_AT_SPARK.replace("AS STRING", "AS VARCHAR"),
    tables=["events"],
    tags=["compat", "agg", "arrays"],
    description=(
        "ClickHouse groupArrayInsertAt(default, 4): per-user fixed-size "
        "slot array (position = hour band, MIN on collisions — "
        "deterministic variant), rendered as one CSV string"
    ),
)


# --- sumMapFiltered --------------------------------------------------------------
_SUM_MAP_FILTERED_SPARK = """
    WITH per_type AS (
      SELECT user_id, event_type,
             CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS v
      FROM events
      WHERE event_type IN ('click', 'view')
      GROUP BY user_id, event_type
    ),
    packed AS (
      SELECT user_id,
             sort_array(collect_list(struct(event_type, v))) AS kv
      FROM per_type
      GROUP BY user_id
    )
    SELECT user_id,
           concat_ws(',', transform(kv, x -> x.event_type)) AS keys_csv,
           concat_ws(',', transform(kv,
             x -> CAST(CAST(x.v AS DECIMAL(18,4)) AS STRING))) AS sums_csv
    FROM packed
    ORDER BY user_id
"""

_SUM_MAP_FILTERED_DUCK = """
    WITH per_type AS (
      SELECT user_id, event_type,
             CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS v
      FROM events
      WHERE event_type IN ('click', 'view')
      GROUP BY user_id, event_type
    ),
    packed AS (
      SELECT user_id,
             list_sort(list({'event_type': event_type, 'v': v})) AS kv
      FROM per_type
      GROUP BY user_id
    )
    SELECT user_id,
           array_to_string(list_transform(kv, x -> x.event_type), ',')
             AS keys_csv,
           array_to_string(list_transform(kv,
             x -> CAST(CAST(x.v AS DECIMAL(18,4)) AS VARCHAR)), ',')
             AS sums_csv
    FROM packed
    ORDER BY user_id
"""

REGISTRY.sql_query(
    "agg_summap_filtered",
    _SUM_MAP_FILTERED_SPARK,
    oracle=_SUM_MAP_FILTERED_DUCK,
    tables=["events"],
    tags=["compat", "agg", "map", "arrays"],
    description=(
        "ClickHouse sumMapFiltered(['click','view']): key-whitelisted "
        "element-wise sums as parallel sorted CSV arrays (exact "
        "DECIMAL; events_sum_map sibling)"
    ),
)


# --- quantileDeterministic --------------------------------------------------------
_QD_HASH = sample_hash_sql("event_id")
_QD_HALF = SAMPLE_HASH_M // 2

_QUANTILE_DET_SPARK = f"""
    WITH s AS (
      SELECT CAST(FLOOR(value * 100) AS BIGINT) AS x
      FROM events
      WHERE {_QD_HASH} < {_QD_HALF}
    ),
    c AS (SELECT x, COUNT(*) AS cnt FROM s GROUP BY x),
    cum AS (
      SELECT x,
             SUM(cnt) OVER (ORDER BY x) AS cum,
             SUM(cnt) OVER () AS n
      FROM c
    )
    SELECT MIN(CASE WHEN cum >= CEIL(0.5 * n) THEN x END) AS med_cents,
           MIN(CASE WHEN cum >= CEIL(0.9 * n) THEN x END) AS p90_cents,
           CAST(MIN(n) AS BIGINT) AS n_sampled
    FROM cum
"""

REGISTRY.sql_query(
    "quantile_deterministic",
    _QUANTILE_DET_SPARK,
    oracle=_QUANTILE_DET_SPARK,
    tables=["events"],
    tags=["compat", "quantile", "sample"],
    description=(
        "ClickHouse quantileDeterministic(x, determinator): exact "
        "type-1 quantile over the determinator-hash half-sample "
        "(two-round Lehmer, the SAMPLE clause hash); grouped-counts "
        "cumulative walk, no global per-row sort"
    ),
)
