"""Host-surface conformance queries — SURVEY.md §2.2.

The reference delegates every relational operator to its host engine
(DuckDB above the table functions — /root/reference/README.md:63-72
shows count/max/WHERE/LIMIT running above the scan) or to the remote
ClickHouse server. In our engine the host surface IS Spark SQL /
DataFrame + Catalyst; this module exercises that surface category by
category so the driver can hash-compare each against DuckDB.

Where the Spark and DuckDB SQL dialects coincide the same text is
used for both sides (guaranteeing column-name alignment); DataFrame-
API builders are used for the join/window/setop families to exercise
that surface too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from .base import REGISTRY, load_tables


def _bucketed_tables(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Create (once per session per sf) bucketed+sorted copies of
    orders/lineitem co-partitioned on the join key — Spark's answer to
    'co-located joins' at scale: both sides hash into the same 8
    buckets at WRITE time, so the join needs no shuffle at READ time
    (the plan's only exchange is the final aggregation's)."""
    import hashlib
    import os
    import tempfile

    from .base import ensure_session

    ensure_session(spark)
    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:8]
    names = (f"chsql_b_orders_{tag}", f"chsql_b_lineitem_{tag}")
    base = os.path.join(tempfile.gettempdir(), "chsql_bucketed", tag)
    specs = [
        (names[0], f"{sf_dir}/orders.parquet", "o_orderkey"),
        (names[1], f"{sf_dir}/lineitem.parquet", "l_orderkey"),
    ]
    for name, src, key in specs:
        if not spark.catalog.tableExists(name):
            (
                spark.read.parquet(src)
                .write.bucketBy(8, key)
                .sortBy(key)
                .option("path", os.path.join(base, name))
                .mode("overwrite")
                .saveAsTable(name)
            )
    return names


def _bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    t_orders, t_lineitem = _bucketed_tables(spark, sf_dir)
    return spark.sql(
        f"""
        SELECT o_orderstatus,
               COUNT(*) AS n_lines,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS qty
        FROM {t_orders} JOIN {t_lineitem} ON o_orderkey = l_orderkey
        GROUP BY o_orderstatus
        """
    )


REGISTRY.df_query(
    "join_bucketed_colocated",
    _bucketed_join,
    oracle="""
    SELECT o_orderstatus, COUNT(*) AS n_lines,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS qty
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderstatus
    """,
    tags=["join", "bucketing", "scale"],
    description="bucketed co-located join: both sides pre-hashed into 8 buckets, shuffle-free join",
)

# ---------------------------------------------------------------------------
# scan / projection / filter / limit  (README.md:54,63-72 surface)
# ---------------------------------------------------------------------------

REGISTRY.sql_query(
    "scan_project_filter",
    """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE o_orderstatus = 'F' AND o_totalprice > 150000
    """,
    tables=["orders"],
    tags=["scan", "filter"],
    description="projection + predicate; Catalyst pushes both into the parquet scan",
)

REGISTRY.sql_query(
    "topk_orders",
    """
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
    tables=["orders"],
    tags=["sort", "limit"],
    description="top-k: Spark plans TakeOrderedAndProject, no full sort",
)

# ---------------------------------------------------------------------------
# aggregation (README.md:63-69: count(*), max(number) over the scan)
# ---------------------------------------------------------------------------

REGISTRY.sql_query(
    "agg_global",
    """
    SELECT COUNT(*) AS n_rows,
           COUNT(DISTINCT l_orderkey) AS n_orders,
           CAST(MAX(l_orderkey) AS BIGINT) AS max_orderkey,
           CAST(MIN(l_orderkey) AS BIGINT) AS min_orderkey,
           CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS DOUBLE)
             / 100.0 AS sum_qty,
           CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS DOUBLE)
             / 100.0 / COUNT(*) AS avg_qty
    FROM lineitem
    """,
    tables=["lineitem"],
    tags=["agg"],
    description="ungrouped aggregate — the reference's own smoke queries",
)

# Exact INTEGER fixed-point instead of DECIMAL accumulation (r9):
# every money/rate column in the corpus is an exact 2-decimal multiple
# (asserted by tests/test_fixed_point_exact.py), so cents-quantized
# BIGINT sums are exact, order-independent, and engine-identical like
# the decimal form — but run in whole-stage-codegen integer arithmetic
# instead of Spark's Decimal128 path: measured 1.22 -> 0.48 s at sf0.1
# (values bit-identical to the decimal form). disc_price/charge become
# exact 1e-4/1e-6-unit integers.  r10 overflow guard, v2: a plain
# BIGINT sum of the ~1.1e11-magnitude charge products wraps 2^63
# silently (non-ANSI mode) at ~8e7 lineitem rows (~SF14).  Instead of
# paying Decimal128 addition per row, each product is SPLIT into
# hi = x >> 20 and lo = x & 0xFFFFF (both non-negative — the products
# are provably positive: price > 0, discount <= 0.10, tax >= 0), the
# two BIGINT sums run in whole-stage-codegen integer arithmetic
# (hi <= ~1e5/row and lo < 2^20/row -> no wrap before ~9e13 rows,
# ~SF1.5e7), and ONE DECIMAL(38,0) multiply-add per GROUP recombines
# them exactly: total = hi_sum * 2^20 + lo_sum.  Measured 0.74 -> 0.55
# s at sf0.1 vs the per-row DECIMAL(38,0) cast, values bit-identical.
REGISTRY.sql_query(
    "q1_pricing_summary",
    """
    WITH fx AS (
      SELECT l_returnflag, l_linestatus,
             CAST(ROUND(l_quantity * 100) AS BIGINT) AS q_c,
             CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS p_c,
             CAST(ROUND(l_discount * 100) AS BIGINT) AS d_c,
             CAST(ROUND(l_tax * 100) AS BIGINT) AS t_c
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    ),
    pr AS (
      SELECT l_returnflag, l_linestatus, q_c, p_c, d_c,
             p_c * (100 - d_c) AS dp,
             p_c * (100 - d_c) * (100 + t_c) AS ch
      FROM fx
    )
    SELECT l_returnflag,
           l_linestatus,
           CAST(SUM(q_c) AS DOUBLE) / 100.0 AS sum_qty,
           CAST(SUM(p_c) AS DOUBLE) / 100.0 AS sum_base_price,
           CAST(CAST(SUM(dp >> 20) AS DECIMAL(38,0)) * 1048576
                + SUM(dp & 1048575) AS DOUBLE) / 10000.0 AS sum_disc_price,
           CAST(CAST(SUM(ch >> 20) AS DECIMAL(38,0)) * 1048576
                + SUM(ch & 1048575) AS DOUBLE) / 1000000.0 AS sum_charge,
           CAST(SUM(q_c) AS DOUBLE) / 100.0 / COUNT(*) AS avg_qty,
           CAST(SUM(p_c) AS DOUBLE) / 100.0 / COUNT(*) AS avg_price,
           CAST(SUM(d_c) AS DOUBLE) / 100.0 / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM pr
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    tables=["lineitem"],
    tags=["agg", "flagship"],
    description="TPC-H Q1 pricing summary (flagship query; exact "
    "cents-quantized BIGINT aggregation)",
)

REGISTRY.sql_query(
    "q6_forecast_revenue",
    """
    SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    tables=["lineitem"],
    tags=["agg", "filter"],
    description="TPC-H Q6: tight filter + single aggregate",
)

REGISTRY.sql_query(
    "distinct_segments",
    "SELECT DISTINCT c_mktsegment FROM customer",
    tables=["customer"],
    tags=["distinct"],
)

REGISTRY.sql_query(
    "group_having",
    """
    SELECT o_custkey, COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_spent
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(*) >= 3
    """,
    tables=["orders"],
    tags=["agg", "having"],
)

REGISTRY.sql_query(
    "rollup_orders",
    """
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
           CAST(GROUPING(o_orderpriority) AS INT) AS g_prio,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
    FROM orders
    GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
    """,
    tables=["orders"],
    tags=["agg", "rollup"],
)

REGISTRY.sql_query(
    "cube_lineitem",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
           CAST(GROUPING(l_linestatus) AS INT) AS g_status,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY CUBE(l_returnflag, l_linestatus)
    """,
    tables=["lineitem"],
    tags=["agg", "cube"],
)

REGISTRY.sql_query(
    "grouping_sets_events",
    """
    SELECT event_type, CAST(year(ts) AS INT) AS yr, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY GROUPING SETS ((event_type), (yr), (event_type, yr), ())
    """,
    tables=["events"],
    tags=["agg", "grouping_sets"],
)

REGISTRY.df_query(
    "approx_distinct_parts",
    lambda spark, sf_dir: load_tables(spark, sf_dir, ["lineitem"])["lineitem"].agg(
        F.count_distinct("l_partkey").alias("exact_parts"),
        F.when(
            (
                F.abs(
                    F.approx_count_distinct("l_partkey")
                    - F.count_distinct("l_partkey")
                )
                / F.count_distinct("l_partkey")
            )
            < 0.2,
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("approx_ok"),
    ),
    # HLL sketch values differ across engines by design; the checkable
    # contract is the error bound: each engine's own approx count must
    # land within 20% of the exact count (both emit approx_ok = 1).
    oracle="""
    SELECT COUNT(DISTINCT l_partkey) AS exact_parts,
           CASE WHEN abs(approx_count_distinct(l_partkey)
                         - COUNT(DISTINCT l_partkey))
                     / COUNT(DISTINCT l_partkey) < 0.2
                THEN 1 ELSE 0 END AS approx_ok
    FROM lineitem
    """,
    tags=["agg", "approx"],
    description="approx_count_distinct (HLL) bounded-error check vs the exact count",
)

REGISTRY.sql_query(
    "approx_percentile_bounded",
    """
    SELECT ROUND(percentile(o_totalprice, 0.5), 4) AS exact_p50,
           ROUND(percentile(o_totalprice, 0.9), 4) AS exact_p90,
           CASE WHEN abs(percentile_approx(o_totalprice, 0.5, 10000)
                         - percentile(o_totalprice, 0.5))
                     / percentile(o_totalprice, 0.5) < 0.02
                 AND abs(percentile_approx(o_totalprice, 0.9, 10000)
                         - percentile(o_totalprice, 0.9))
                     / percentile(o_totalprice, 0.9) < 0.02
                THEN 1 ELSE 0 END AS approx_ok
    FROM orders
    """,
    # quantile sketches (GK/t-digest) differ across engines by design;
    # as with approx_distinct_parts, the checkable contract is each
    # engine's OWN sketch landing within 2% of its exact quantile,
    # plus the exact interpolated quantiles themselves (identical
    # inputs -> identical doubles, rounded 4 digits)
    oracle="""
    SELECT ROUND(quantile_cont(o_totalprice, 0.5), 4) AS exact_p50,
           ROUND(quantile_cont(o_totalprice, 0.9), 4) AS exact_p90,
           CASE WHEN abs(approx_quantile(o_totalprice, 0.5)
                         - quantile_cont(o_totalprice, 0.5))
                     / quantile_cont(o_totalprice, 0.5) < 0.02
                 AND abs(approx_quantile(o_totalprice, 0.9)
                         - quantile_cont(o_totalprice, 0.9))
                     / quantile_cont(o_totalprice, 0.9) < 0.02
                THEN 1 ELSE 0 END AS approx_ok
    FROM orders
    """,
    tables=["orders"],
    tags=["agg", "approx", "percentile"],
    description="approx quantile sketch bounded-error check vs exact interpolated quantiles",
)

# ---------------------------------------------------------------------------
# joins — inner/left/right/full/semi/anti/cross/non-equi (§2.2)
# ---------------------------------------------------------------------------


def _q3_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["customer", "orders", "lineitem"])
    cust = t["customer"].filter(F.col("c_mktsegment") == "BUILDING")
    orders = t["orders"].filter(F.col("o_orderdate") < F.lit("1995-03-15").cast("timestamp_ntz"))
    li = t["lineitem"].filter(F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp_ntz"))
    # customer is the small side at every SF -> broadcast it
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")
            ).cast("double").alias("revenue")
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


REGISTRY.df_query(
    "q3_shipping_priority",
    _q3_shipping,
    oracle="""
    SELECT l_orderkey, o_orderdate,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    tags=["join", "agg", "topk"],
    description="TPC-H Q3: 3-way join, broadcast dim, top-10",
)


def _q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(
        spark, sf_dir, ["region", "nation", "customer", "supplier", "orders", "lineitem"]
    )
    # dims (region/nation) broadcast; fact-fact joins shuffle on keys
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(
            t["supplier"],
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "ASIA")
        .groupBy("n_name")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")
            ).cast("double").alias("revenue")
        )
        .orderBy(F.desc("revenue"), "n_name")
    )


REGISTRY.df_query(
    "q5_local_supplier",
    _q5_local_supplier,
    oracle="""
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
    tags=["join", "agg"],
    description="TPC-H Q5: 6-way join with broadcast dims",
)


def _q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["customer", "orders", "lineitem", "nation"])
    return (
        t["lineitem"]
        .filter(F.col("l_returnflag") == "R")
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")
            ).cast("double").alias("revenue")
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


REGISTRY.df_query(
    "q10_returned_items",
    _q10_returned_items,
    oracle="""
    SELECT c_custkey, c_name, n_name,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    tags=["join", "agg", "topk"],
    description="TPC-H Q10: returned-item ranking",
)


def _join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["customer", "orders"])
    agg = t["orders"].groupBy("o_custkey").agg(F.count("*").alias("n_orders"))
    return (
        t["customer"]
        .join(agg, t["customer"].c_custkey == agg.o_custkey, "left")
        .select(
            "c_custkey", "c_name", F.coalesce("n_orders", F.lit(0)).alias("n_orders")
        )
    )


REGISTRY.df_query(
    "join_left_outer",
    _join_left,
    oracle="""
    SELECT c_custkey, c_name, COALESCE(n_orders, 0) AS n_orders
    FROM customer
    LEFT JOIN (SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY o_custkey) o
      ON c_custkey = o_custkey
    """,
    tags=["join"],
)


def _join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["customer", "supplier"])
    c = t["customer"].groupBy("c_nationkey").agg(F.count("*").alias("n_cust"))
    s = t["supplier"].groupBy("s_nationkey").agg(F.count("*").alias("n_supp"))
    return (
        c.join(s, c.c_nationkey == s.s_nationkey, "full")
        .select(
            F.coalesce("c_nationkey", "s_nationkey").alias("nationkey"),
            F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
            F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
        )
    )


REGISTRY.df_query(
    "join_full_outer",
    _join_full,
    oracle="""
    SELECT COALESCE(c_nationkey, s_nationkey) AS nationkey,
           COALESCE(n_cust, 0) AS n_cust,
           COALESCE(n_supp, 0) AS n_supp
    FROM (SELECT c_nationkey, COUNT(*) AS n_cust FROM customer GROUP BY c_nationkey) c
    FULL JOIN (SELECT s_nationkey, COUNT(*) AS n_supp FROM supplier GROUP BY s_nationkey) s
      ON c_nationkey = s_nationkey
    """,
    tags=["join"],
)


def _join_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["customer", "orders"])
    has_orders = (
        t["customer"]
        .join(t["orders"], t["customer"].c_custkey == t["orders"].o_custkey, "left_semi")
        .select(F.lit("with_orders").alias("bucket"), "c_custkey")
    )
    no_orders = (
        t["customer"]
        .join(t["orders"], t["customer"].c_custkey == t["orders"].o_custkey, "left_anti")
        .select(F.lit("without_orders").alias("bucket"), "c_custkey")
    )
    return has_orders.unionAll(no_orders)


REGISTRY.df_query(
    "join_semi_anti",
    _join_semi_anti,
    oracle="""
    SELECT 'with_orders' AS bucket, c_custkey FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    UNION ALL
    SELECT 'without_orders' AS bucket, c_custkey FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    tags=["join", "semi", "anti", "setop"],
    description="left-semi (EXISTS) + left-anti (NOT EXISTS) in one result",
)

REGISTRY.sql_query(
    "join_right_outer",
    """
    SELECT n_name, s_suppkey
    FROM supplier
    RIGHT JOIN nation ON s_nationkey = n_nationkey
    """,
    tables=["supplier", "nation"],
    tags=["join"],
)

REGISTRY.sql_query(
    "join_cross_small",
    """
    SELECT r1.r_name AS from_region, r2.r_name AS to_region
    FROM region r1 CROSS JOIN region r2
    WHERE r1.r_regionkey <> r2.r_regionkey
    """,
    tables=["region"],
    tags=["join", "cross"],
)

REGISTRY.sql_query(
    "join_non_equi_range",
    """
    SELECT p_partkey, p_name, l_orderkey, l_linenumber
    FROM part
    JOIN lineitem ON l_partkey = p_partkey
                 AND l_quantity BETWEEN p_size - 2 AND p_size + 2
    WHERE p_size >= 48
    """,
    tables=["part", "lineitem"],
    tags=["join", "non_equi"],
    description="equi key + range residual (band join)",
)

# ---------------------------------------------------------------------------
# window functions (§2.2: ranking / analytic / frames)
# ---------------------------------------------------------------------------


def _window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["orders"])
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        t["orders"]
        .withColumn("rn", F.row_number().over(w))
        .withColumn("rk", F.rank().over(w))
        .withColumn("drk", F.dense_rank().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn", "rk", "drk")
    )


REGISTRY.df_query(
    "window_topk_per_group",
    _window_rank,
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn, rk, drk FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
             CAST(RANK() OVER w AS BIGINT) AS rk,
             CAST(DENSE_RANK() OVER w AS BIGINT) AS drk
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    ) t WHERE rn <= 3
    """,
    tags=["window", "topk"],
    description="top-3 orders per customer via ranking window",
)


def _window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["events"])
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return t["events"].select(
        "user_id",
        "event_id",
        "ts",
        F.lag("event_type", 1).over(w).alias("prev_type"),
        F.lead("event_type", 1).over(w).alias("next_type"),
        (
            F.col("ts").cast("timestamp").cast("double")
            - F.lag(F.col("ts").cast("timestamp").cast("double"), 1).over(w)
        ).alias("gap_seconds"),
    )


REGISTRY.df_query(
    "window_lag_lead",
    _window_lag_lead,
    oracle="""
    SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
           LAG(event_type, 1) OVER w AS prev_type,
           LEAD(event_type, 1) OVER w AS next_type,
           EPOCH(CAST(ts AS TIMESTAMP)) - LAG(EPOCH(CAST(ts AS TIMESTAMP)), 1) OVER w AS gap_seconds
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
    """,
    tags=["window"],
    description="lag/lead + inter-event gap per user",
)


def _window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["events"])
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return t["events"].select(
        "user_id",
        "event_id",
        F.sum(F.col("value").cast("decimal(18,4)"))
        .over(w.rowsBetween(W.unboundedPreceding, 0))
        .cast("double")
        .alias("running_value"),
        F.count("*").over(w.rowsBetween(-2, 0)).alias("n_last3"),
        F.max(F.col("value").cast("decimal(18,4)"))
        .over(w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing))
        .cast("double")
        .alias("user_max_value"),
    )


REGISTRY.df_query(
    "window_frames",
    _window_frames,
    oracle="""
    SELECT user_id, event_id,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER
                (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value,
           COUNT(*) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS n_last3,
           CAST(MAX(CAST(value AS DECIMAL(18,4))) OVER
                (PARTITION BY user_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS DOUBLE) AS user_max_value
    FROM events
    """,
    tags=["window", "frames"],
    description="running sum / sliding count / partition max frames",
)

REGISTRY.sql_query(
    "window_ntile_percent",
    """
    SELECT c_custkey,
           CAST(NTILE(4) OVER (ORDER BY c_acctbal DESC, c_custkey) AS BIGINT) AS quartile,
           ROUND(PERCENT_RANK() OVER (ORDER BY c_acctbal DESC, c_custkey), 8) AS pct_rank
    FROM customer
    """,
    tables=["customer"],
    tags=["window"],
)

# ---------------------------------------------------------------------------
# set operations
# ---------------------------------------------------------------------------


def _setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["customer", "supplier"])
    cust_nations = t["customer"].select(F.col("c_nationkey").alias("nationkey"))
    supp_nations = t["supplier"].select(F.col("s_nationkey").alias("nationkey"))
    both = cust_nations.intersect(supp_nations).withColumn("op", F.lit("intersect"))
    only_cust = cust_nations.exceptAll(supp_nations).distinct().withColumn(
        "op", F.lit("except")
    )
    union_distinct = cust_nations.union(supp_nations).distinct().withColumn(
        "op", F.lit("union")
    )
    return both.unionAll(only_cust).unionAll(union_distinct)


REGISTRY.df_query(
    "setops_nations",
    _setops,
    oracle="""
    SELECT nationkey, 'intersect' AS op FROM
      (SELECT c_nationkey AS nationkey FROM customer INTERSECT SELECT s_nationkey FROM supplier) t1
    UNION ALL
    SELECT nationkey, 'except' AS op FROM
      (SELECT DISTINCT nationkey FROM
        (SELECT c_nationkey AS nationkey FROM customer EXCEPT ALL SELECT s_nationkey FROM supplier) e) t2
    UNION ALL
    SELECT nationkey, 'union' AS op FROM
      (SELECT c_nationkey AS nationkey FROM customer UNION SELECT s_nationkey FROM supplier) t3
    """,
    tags=["setop"],
    description="INTERSECT / EXCEPT ALL+DISTINCT / UNION in one result",
)

# ---------------------------------------------------------------------------
# scalar functions (string / date / math / conditional) — §2.2 row
# ---------------------------------------------------------------------------

REGISTRY.sql_query(
    "scalar_string_funcs",
    """
    SELECT p_partkey,
           UPPER(p_name) AS up_name,
           LOWER(p_brand) AS low_brand,
           LENGTH(p_name) AS name_len,
           SUBSTR(p_name, 1, 5) AS name_prefix,
           CONCAT(p_brand, ':', p_type) AS brand_type,
           REPLACE(p_type, ' ', '_') AS type_snake,
           TRIM(CONCAT('  ', p_brand, ' ')) AS trimmed,
           LPAD(CAST(p_size AS STRING), 4, '0') AS size_padded,
           CASE WHEN p_name LIKE '%green%' THEN 1 ELSE 0 END AS is_green
    FROM part
    """,
    oracle="""
    SELECT p_partkey,
           UPPER(p_name) AS up_name,
           LOWER(p_brand) AS low_brand,
           LENGTH(p_name) AS name_len,
           SUBSTR(p_name, 1, 5) AS name_prefix,
           CONCAT(p_brand, ':', p_type) AS brand_type,
           REPLACE(p_type, ' ', '_') AS type_snake,
           TRIM(CONCAT('  ', p_brand, ' ')) AS trimmed,
           LPAD(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
           CASE WHEN p_name LIKE '%green%' THEN 1 ELSE 0 END AS is_green
    FROM part
    """,
    tables=["part"],
    tags=["scalar", "string"],
)

REGISTRY.sql_query(
    "scalar_date_funcs",
    """
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT) AS yr,
           CAST(month(o_orderdate) AS INT) AS mon,
           CAST(day(o_orderdate) AS INT) AS dom,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
           CAST(o_orderdate AS DATE) AS order_date
    FROM orders
    """,
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT) AS yr,
           CAST(month(o_orderdate) AS INT) AS mon,
           CAST(day(o_orderdate) AS INT) AS dom,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
           CAST(o_orderdate AS DATE) AS order_date
    FROM orders
    """,
    tables=["orders"],
    tags=["scalar", "date"],
)

REGISTRY.sql_query(
    "scalar_math_funcs",
    """
    SELECT l_orderkey, l_linenumber,
           ABS(l_discount - 0.05) AS abs_diff,
           CAST(CEIL(l_quantity) AS BIGINT) AS qty_ceil,
           CAST(FLOOR(l_extendedprice) AS BIGINT) AS price_floor,
           ROUND(SQRT(l_quantity), 8) AS qty_sqrt,
           ROUND(LN(l_extendedprice), 8) AS price_ln,
           CAST(MOD(l_orderkey, 7) AS BIGINT) AS key_mod,
           ROUND(POWER(l_discount, 2), 10) AS disc_sq
    FROM lineitem
    """,
    tables=["lineitem"],
    tags=["scalar", "math"],
)

REGISTRY.sql_query(
    "scalar_conditional",
    """
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'debt'
                WHEN c_acctbal < 5000 THEN 'low'
                ELSE 'high' END AS balance_band,
           COALESCE(NULLIF(c_mktsegment, 'MACHINERY'), 'OTHER') AS segment_or_other,
           IF(c_acctbal >= 0, 1, 0) AS non_negative
    FROM customer
    """,
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'debt'
                WHEN c_acctbal < 5000 THEN 'low'
                ELSE 'high' END AS balance_band,
           COALESCE(NULLIF(c_mktsegment, 'MACHINERY'), 'OTHER') AS segment_or_other,
           CASE WHEN c_acctbal >= 0 THEN 1 ELSE 0 END AS non_negative
    FROM customer
    """,
    tables=["customer"],
    tags=["scalar", "conditional"],
)

REGISTRY.sql_query(
    "json_extract_props",
    """
    SELECT event_id,
           CAST(regexp_extract(props, '"k": (-?[0-9]+)', 1) AS BIGINT) AS k_value
    FROM events
    """,
    tables=["events"],
    tags=["scalar", "json"],
    description="JSON field extraction (regexp-based so both dialects agree)",
)

# ---------------------------------------------------------------------------
# pivot / time-bucketed aggregation over events
# ---------------------------------------------------------------------------


def _pivot_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["events"])
    return (
        t["events"]
        .groupBy("user_id")
        .pivot("event_type", ["click", "view", "purchase", "signup", "error"])
        .agg(F.count(F.lit(1)))
        .na.fill(0)
        .select(
            "user_id",
            F.col("click").alias("n_click"),
            F.col("view").alias("n_view"),
            F.col("purchase").alias("n_purchase"),
            F.col("signup").alias("n_signup"),
            F.col("error").alias("n_error"),
        )
    )


REGISTRY.df_query(
    "pivot_event_counts",
    _pivot_events,
    oracle="""
    SELECT user_id,
           COUNT(*) FILTER (WHERE event_type = 'click') AS n_click,
           COUNT(*) FILTER (WHERE event_type = 'view') AS n_view,
           COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
           COUNT(*) FILTER (WHERE event_type = 'signup') AS n_signup,
           COUNT(*) FILTER (WHERE event_type = 'error') AS n_error
    FROM events
    GROUP BY user_id
    """,
    tags=["pivot", "agg"],
    description="pivot = grouped conditional counts",
)

REGISTRY.sql_query(
    "events_time_buckets",
    """
    SELECT date_trunc('hour', ts) AS hour_bucket,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value,
           COUNT(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY date_trunc('hour', ts), event_type
    """,
    oracle="""
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_bucket,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value,
           COUNT(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY 1, event_type
    """,
    tables=["events"],
    tags=["agg", "time"],
    description="hourly tumbling-window aggregation (batch analogue of streaming windows)",
)


def register() -> None:
    """Import side effect — all queries above are already registered."""


# --- mergeable distinct sketches: uniqState / uniqMerge (r10) ---------------
# ClickHouse's AggregatingMergeTree keeps uniqState sketch columns and
# uniqMerge-s them on read.  Spark's first-class analogue is the
# Apache DataSketches HLL surface (hll_sketch_agg / hll_union_agg /
# hll_sketch_estimate): per-group sketches built independently, then
# UNIONED — the mergeable-state contract that makes distinct counts
# incremental at 100 TB (partial sketches per partition/day, merged at
# read).  Sketch bytes differ across engines by design; the checkable
# contract (the approx_distinct_parts precedent) is each engine's own
# merged estimate landing within 5% of the exact distinct over the
# SAME union, plus the exact count itself.
REGISTRY.sql_query(
    "approx_hll_union_merge",
    """
    WITH parts AS (
      SELECT o_orderpriority, hll_sketch_agg(o_custkey) AS sk,
             COUNT(DISTINCT o_custkey) AS exact_part
      FROM orders
      GROUP BY o_orderpriority
    ),
    merged AS (
      SELECT hll_sketch_estimate(hll_union_agg(sk)) AS est
      FROM parts
    ),
    exact AS (
      SELECT COUNT(DISTINCT o_custkey) AS exact_all FROM orders
    )
    SELECT CAST(exact_all AS BIGINT) AS exact_all,
           CASE WHEN ABS(est - exact_all) / exact_all < 0.05
                THEN 1 ELSE 0 END AS merge_ok
    FROM merged CROSS JOIN exact
    """,
    oracle="""
    WITH exact AS (
      SELECT COUNT(DISTINCT o_custkey) AS exact_all FROM orders
    ),
    est AS (
      SELECT approx_count_distinct(o_custkey) AS e FROM orders
    )
    SELECT CAST(exact_all AS BIGINT) AS exact_all,
           CASE WHEN ABS(e - exact_all) / CAST(exact_all AS DOUBLE) < 0.05
                THEN 1 ELSE 0 END AS merge_ok
    FROM est CROSS JOIN exact
    """,
    tables=["orders"],
    tags=["agg", "approx", "sketch", "compat"],
    description="ClickHouse uniqState/uniqMerge via DataSketches HLL: "
    "per-group sketches unioned, merged estimate within 5% of exact "
    "(mergeable-state contract; sketch bytes engine-specific by design)",
)

# ---------------------------------------------------------------------------
# round-10 tranche 6: multiSearch / array set algebra / encodings / IP funcs
# ---------------------------------------------------------------------------

# ClickHouse multiSearchAny / multiSearchFirstIndex /
# multiSearchFirstPosition over a constant needle set, all as plain
# codegen substring probes (the text_ngram_search precedent: built-in
# INSTR beats any per-row Python by orders of magnitude and pushes
# through whole-stage codegen). FirstIndex = 1-based index of the
# needle with the LEFTMOST match (ties -> smallest needle index, the
# ClickHouse tie rule); 0 when none match.
_MULTISEARCH_NEEDLES = ("data", "vector", "stream")


def _multisearch_sql(dialect: str) -> str:
    pos = {
        n: (
            f"INSTR(text, '{n}')"
            if dialect == "spark"
            else f"POSITION('{n}' IN text)"
        )
        for n in _MULTISEARCH_NEEDLES
    }
    p1, p2, p3 = (pos[n] for n in _MULTISEARCH_NEEDLES)
    best = (
        "LEAST("
        + ", ".join(f"CASE WHEN {p} > 0 THEN {p} ELSE 2147483647 END" for p in (p1, p2, p3))
        + ")"
    )
    return f"""
    WITH probed AS (
      SELECT doc_id, lang,
             {p1} AS pos1, {p2} AS pos2, {p3} AS pos3,
             {best} AS first_pos
      FROM documents
    )
    SELECT doc_id, lang,
           CAST(CASE WHEN first_pos < 2147483647 THEN 1 ELSE 0 END AS INT) AS any_match,
           CAST(CASE
             WHEN first_pos = 2147483647 THEN 0
             WHEN pos1 = first_pos THEN 1
             WHEN pos2 = first_pos THEN 2
             ELSE 3 END AS INT) AS first_index,
           CAST(CASE WHEN first_pos = 2147483647 THEN 0 ELSE first_pos END AS INT)
             AS first_position
    FROM probed
    """


REGISTRY.sql_query(
    "text_multi_search",
    _multisearch_sql("spark"),
    oracle=_multisearch_sql("duckdb"),
    tables=["documents"],
    tags=["scalar", "string", "multisearch"],
    description="multiSearchAny / multiSearchFirstIndex / "
    "multiSearchFirstPosition as codegen INSTR probes with the "
    "ClickHouse leftmost-match tie rule",
)


# arrayIntersect / arrayUnion(distinct) / arrayUniq / arrayCompact over
# tokenized text. Sizes (not the arrays) are compared: set-function
# output order is engine-defined, and the driver canonicalizer rejects
# list columns anyway (tools/oracle_type_audit.py). arrayCompact is the
# consecutive-dedup (run-collapse) semantics, built with an
# index-lambda filter in BOTH engines — 0-based in Spark, 1-based in
# DuckDB, which makes the two formulations structurally independent.
REGISTRY.sql_query(
    "array_set_functions",
    """
    WITH toks AS (
      SELECT doc_id, slice(split(text, ' '), 1, 24) AS ts FROM documents
    )
    SELECT doc_id,
           CAST(size(array_intersect(ts, array('data','the','value','vector'))) AS INT)
             AS n_inter,
           CAST(size(array_union(ts, array('data','the'))) AS INT) AS n_union,
           CAST(size(array_distinct(ts)) AS INT) AS n_uniq,
           CAST(size(filter(ts, (x, i) -> i = 0 OR NOT (x <=> element_at(ts, i)))) AS INT)
             AS n_compact
    FROM toks
    """,
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ')[1:24] AS ts FROM documents
    )
    SELECT doc_id,
           CAST(len(list_intersect(ts, ['data','the','value','vector'])) AS INT)
             AS n_inter,
           CAST(len(list_distinct(list_concat(ts, ['data','the']))) AS INT) AS n_union,
           CAST(len(list_distinct(ts)) AS INT) AS n_uniq,
           CAST(len(list_filter(ts, (x, i) -> i = 1 OR x IS DISTINCT FROM ts[i - 1])) AS INT)
             AS n_compact
    FROM toks
    """,
    tables=["documents"],
    tags=["array", "set"],
    description="arrayIntersect/arrayUnion/arrayUniq/arrayCompact "
    "(consecutive run-collapse) sizes over tokenized text; Spark "
    "0-based vs DuckDB 1-based index lambdas",
)


# base64Encode / base64Decode / hex / unhex (ClickHouse encoding
# family). The roundtrip column proves decode really inverts encode
# inside the engine, not just that both engines printed the same
# encoding. HEX is normalized to upper case (Spark emits A-F, DuckDB
# emits a-f for the letters).
REGISTRY.sql_query(
    "scalar_encoding_funcs",
    """
    SELECT doc_id,
           BASE64(SUBSTR(text, 1, 12)) AS b64,
           UPPER(HEX(SUBSTR(text, 1, 8))) AS hx,
           CAST(DECODE(UNBASE64(BASE64(SUBSTR(text, 1, 12))), 'UTF-8')
                = SUBSTR(text, 1, 12) AS INT) AS b64_roundtrip,
           CAST(DECODE(UNHEX(HEX(SUBSTR(text, 1, 8))), 'UTF-8')
                = SUBSTR(text, 1, 8) AS INT) AS hex_roundtrip
    FROM documents
    """,
    oracle="""
    SELECT doc_id,
           to_base64(encode(substr(text, 1, 12))) AS b64,
           UPPER(hex(substr(text, 1, 8))) AS hx,
           CAST(decode(from_base64(to_base64(encode(substr(text, 1, 12)))))
                = substr(text, 1, 12) AS INT) AS b64_roundtrip,
           CAST(decode(unhex(hex(substr(text, 1, 8))))
                = substr(text, 1, 8) AS INT) AS hex_roundtrip
    FROM documents
    """,
    tables=["documents"],
    tags=["scalar", "encoding"],
    description="base64/hex encode + in-engine decode roundtrips "
    "(ClickHouse base64Encode/base64Decode/hex/unhex)",
)


# IPv4NumToString / IPv4StringToNum / isIPAddressInRange: a synthetic
# UInt32 address per user (Knuth multiplicative hash of user_id), its
# dotted-quad rendering, a string->num roundtrip proven INSIDE each
# engine (parse the string the engine itself produced), and a /8 CIDR
# membership test. Octet math is the public IPv4 layout; the two
# engines share the formula but compile it independently, and
# tests/test_compat_entries_r10d.py pins known addresses by hand.
def _ip_funcs_sql(dialect: str) -> str:
    idiv = "DIV" if dialect == "spark" else "//"
    if dialect == "spark":
        octet = lambda i: f"CAST((ip {idiv} {256 ** (3 - i)}) % 256 AS STRING)"  # noqa: E731
        part = lambda i: f"CAST(split_part(ip_str, '.', {i + 1}) AS BIGINT)"  # noqa: E731
    else:
        octet = lambda i: f"CAST((ip {idiv} {256 ** (3 - i)}) % 256 AS VARCHAR)"  # noqa: E731
        part = lambda i: f"CAST(string_split(ip_str, '.')[{i + 1}] AS BIGINT)"  # noqa: E731
    quad = " || '.' || ".join(octet(i) for i in range(4)) if dialect == "duckdb" else (
        "CONCAT(" + ", '.', ".join(octet(i) for i in range(4)) + ")"
    )
    back = " + ".join(f"{part(i)} * {256 ** (3 - i)}" for i in range(4))
    return f"""
    WITH addrs AS (
      SELECT DISTINCT user_id,
             (user_id * 2654435761) % 4294967296 AS ip
      FROM events
    ),
    rendered AS (
      SELECT user_id, ip, {quad} AS ip_str FROM addrs
    )
    SELECT user_id, ip, ip_str,
           CAST(({back}) = ip AS INT) AS roundtrip_ok,
           CAST((ip {idiv} 16777216) = 10 AS INT) AS in_10_slash_8
    FROM rendered
    """


REGISTRY.sql_query(
    "scalar_ip_funcs",
    _ip_funcs_sql("spark"),
    oracle=_ip_funcs_sql("duckdb"),
    tables=["events"],
    tags=["scalar", "ip"],
    description="IPv4NumToString / IPv4StringToNum roundtrip + "
    "isIPAddressInRange('10.0.0.0/8') over synthetic UInt32 addresses",
)


# ClickHouse runningAccumulate(uniqState(user_id)) by day: per-day NEW
# user count and the cumulative distinct-user curve. Spark form: one
# groupBy to each user's first day, one to the per-day new-user count,
# then a prefix-sum window (the cumulative input is |days| rows — the
# single-reducer window is over a bounded, already-aggregated key set,
# not the fact table). Oracle form is structurally independent:
# correlated COUNT(DISTINCT) subqueries per day (O(days^2), fine at
# oracle scale, impossible to share a planning bug with the window
# form).
REGISTRY.sql_query(
    "events_cumulative_uniques",
    """
    WITH d AS (SELECT CAST(ts AS DATE) AS day, user_id FROM events),
    firsts AS (SELECT user_id, MIN(day) AS first_day FROM d GROUP BY user_id),
    daily AS (
      SELECT first_day AS day, COUNT(*) AS new_users
      FROM firsts GROUP BY first_day
    ),
    alldays AS (SELECT DISTINCT day FROM d)
    SELECT a.day,
           COALESCE(dl.new_users, 0) AS new_users,
           SUM(COALESCE(dl.new_users, 0))
             OVER (ORDER BY a.day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS cum_users
    FROM alldays a LEFT JOIN daily dl ON a.day = dl.day
    ORDER BY a.day
    """,
    oracle="""
    WITH d AS (SELECT CAST(ts AS DATE) AS day, user_id FROM events),
    days AS (SELECT DISTINCT day FROM d)
    SELECT day,
           (SELECT COUNT(DISTINCT user_id) FROM d WHERE d.day <= days.day)
         - (SELECT COUNT(DISTINCT user_id) FROM d WHERE d.day < days.day)
             AS new_users,
           (SELECT COUNT(DISTINCT user_id) FROM d WHERE d.day <= days.day)
             AS cum_users
    FROM days
    ORDER BY day
    """,
    tables=["events"],
    tags=["events", "timeseries", "cumulative"],
    description="runningAccumulate(uniqState) by day: first-seen "
    "deduplication + bounded prefix-sum window vs correlated "
    "COUNT(DISTINCT) oracle",
)


# ClickHouse transform(x, array_from, array_to, default): the Spark
# form is a literal-map lookup (transform's documented hash-map
# implementation); the oracle is ClickHouse's OTHER documented
# implementation — parallel arrays via list_position — so the two
# formulations mirror the function's two real execution strategies.
REGISTRY.sql_query(
    "scalar_transform_func",
    """
    SELECT event_id,
           COALESCE(
             try_element_at(
               map('view', 'V', 'click', 'C', 'purchase', 'P'), event_type),
             '-') AS code,
           COALESCE(
             try_element_at(
               map('view', 10, 'click', 20, 'purchase', 70), event_type),
             0) AS weight
    FROM events
    """,
    oracle="""
    SELECT event_id,
           COALESCE((['V','C','P'])[
             list_position(['view','click','purchase'], event_type)],
             '-') AS code,
           COALESCE(([10,20,70])[
             list_position(['view','click','purchase'], event_type)],
             0) AS weight
    FROM events
    """,
    tables=["events"],
    tags=["scalar", "transform"],
    description="transform(x, from, to, default): Spark literal-map "
    "lookup vs DuckDB parallel-array list_position — the function's "
    "two documented execution strategies as independent twins",
)


# arrayDotProduct / L2Norm / cosineDistance scalar family over the
# embeddings table, fixed-point exact: elements quantize to BIGINT
# mils (CAST AS DOUBLE first — f32*1000 in f32 would round differently
# across engines), then the dot/norm sums are exact integers. The
# Spark form folds with the aggregate() HOF; the oracle uses
# list_sum/list_transform — different higher-order machinery, same
# integers. Cosine vs the all-ones reference vector is the one
# round(9)-guarded float.
REGISTRY.sql_query(
    "scalar_vector_funcs",
    """
    WITH q AS (
      SELECT vec_id,
             transform(embedding,
                       x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS e
      FROM embeddings
    )
    SELECT vec_id,
           CAST(size(e) AS INT) AS dim,
           aggregate(e, 0L, (acc, x) -> acc + x) AS dot_ones,
           aggregate(e, 0L, (acc, x) -> acc + x * x) AS norm2,
           ROUND(CAST(aggregate(e, 0L, (acc, x) -> acc + x) AS DOUBLE)
                 / (SQRT(CAST(size(e) AS DOUBLE))
                    * SQRT(CAST(aggregate(e, 0L, (acc, x) -> acc + x * x) AS DOUBLE))),
                 9) AS cos_ones
    FROM q
    """,
    oracle="""
    WITH q AS (
      SELECT vec_id,
             list_transform(embedding,
                            x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS e
      FROM embeddings
    )
    SELECT vec_id,
           CAST(len(e) AS INT) AS dim,
           CAST(list_sum(e) AS BIGINT) AS dot_ones,
           CAST(list_sum(list_transform(e, x -> x * x)) AS BIGINT) AS norm2,
           ROUND(CAST(list_sum(e) AS DOUBLE)
                 / (SQRT(CAST(len(e) AS DOUBLE))
                    * SQRT(CAST(list_sum(list_transform(e, x -> x * x)) AS DOUBLE))),
                 9) AS cos_ones
    FROM q
    """,
    tables=["embeddings"],
    tags=["scalar", "vector"],
    description="arrayDotProduct/L2Norm/cosineDistance vs the all-ones "
    "reference: fixed-point BIGINT mils, aggregate() fold vs "
    "list_sum/list_transform, one guarded float",
)


# quantileExact / quantilesExact: nearest-rank (idx = ceil(q*n),
# 1-based) over lineitem quantity cents. The Spark form is the
# grouped-cumulative selection (MIN value whose running count reaches
# the rank — the scale shape: the window runs over DISTINCT VALUES,
# never rows); the oracle selects positionally with ROW_NUMBER over
# rows. Every output is an exact BIGINT.
_QEXACT_LEVELS = (25, 50, 75, 90)
_QEXACT_SPARK = """
    WITH s AS (
      SELECT CAST(FLOOR(l_quantity * 100) AS BIGINT) AS v FROM lineitem
    ),
    g AS (SELECT v, COUNT(*) AS cnt FROM s GROUP BY v),
    cum AS (
      SELECT v, SUM(cnt) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
      FROM g
    ),
    n_t AS (SELECT COUNT(*) AS n FROM s)
    SELECT
      CAST(MIN(CASE WHEN c >= CEIL(0.25 * n) THEN v END) AS BIGINT) AS q25,
      CAST(MIN(CASE WHEN c >= CEIL(0.50 * n) THEN v END) AS BIGINT) AS q50,
      CAST(MIN(CASE WHEN c >= CEIL(0.75 * n) THEN v END) AS BIGINT) AS q75,
      CAST(MIN(CASE WHEN c >= CEIL(0.90 * n) THEN v END) AS BIGINT) AS q90,
      CAST(MAX(n) AS BIGINT) AS n
    FROM cum CROSS JOIN n_t
"""
_QEXACT_DUCK = """
    WITH s AS (
      SELECT CAST(FLOOR(l_quantity * 100) AS BIGINT) AS v FROM lineitem
    ),
    r AS (
      SELECT v, ROW_NUMBER() OVER (ORDER BY v) AS rn, COUNT(*) OVER () AS n
      FROM s
    )
    SELECT
      CAST(MIN(CASE WHEN rn = CEIL(0.25 * n) THEN v END) AS BIGINT) AS q25,
      CAST(MIN(CASE WHEN rn = CEIL(0.50 * n) THEN v END) AS BIGINT) AS q50,
      CAST(MIN(CASE WHEN rn = CEIL(0.75 * n) THEN v END) AS BIGINT) AS q75,
      CAST(MIN(CASE WHEN rn = CEIL(0.90 * n) THEN v END) AS BIGINT) AS q90,
      CAST(MAX(n) AS BIGINT) AS n
    FROM r
"""

REGISTRY.sql_query(
    "quantile_exact_multi",
    _QEXACT_SPARK,
    oracle=_QEXACT_DUCK,
    tables=["lineitem"],
    tags=["agg", "quantile", "compat"],
    description="quantilesExact nearest-rank (ceil(q*n)) over quantity "
    "cents: grouped-cumulative selection over DISTINCT values (Spark, "
    "scale shape) vs positional ROW_NUMBER (oracle); exact BIGINTs",
)


# formatDateTime %-patterns (functions/datetime.py): the ClickHouse
# spelling runs verbatim on Spark through the %-to-Java translation;
# the oracle's strftime consumes the %-pattern NATIVELY, so the twins
# are structurally independent by construction. ISO week/day fields
# exercise the week-based-year corner (Jan 1 often belongs to the
# previous ISO year).
def _format_datetime_sql() -> str:
    from ..functions.datetime import format_datetime_expr as f

    return f"""
    SELECT event_id,
           {f('ts', '%Y-%m-%d %H:%M:%S')} AS iso_full,
           {f('ts', '%F')} AS iso_date,
           {f('ts', '%d/%m/%y')} AS euro,
           {f('ts', '%j')} AS day_of_year,
           {f('ts', '%G-%V')} AS iso_week,
           CAST({f('ts', '%u')} AS INT) AS iso_dow,
           {f('ts', '100%% at %H:%M')} AS with_literal
    FROM events
    """


REGISTRY.sql_query(
    "scalar_format_datetime",
    _format_datetime_sql(),
    oracle="""
    SELECT event_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS iso_full,
           strftime(ts, '%Y-%m-%d') AS iso_date,
           strftime(ts, '%d/%m/%y') AS euro,
           strftime(ts, '%j') AS day_of_year,
           strftime(ts, '%G-%V') AS iso_week,
           CAST(isodow(ts) AS INT) AS iso_dow,
           '100% at ' || strftime(ts, '%H:%M') AS with_literal
    FROM events
    """,
    tables=["events"],
    tags=["scalar", "datetime", "compat"],
    description="formatDateTime %-patterns translated to Java "
    "DateTimeFormatter (Spark) vs native strftime (oracle), incl. ISO "
    "week-year %G-%V, ISO dow %u and %%-literal escapes",
)


# parseDateTime (the inverse): format each ts to a string with the
# %-shim, parse it back, prove the roundtrip equals the
# second-truncated original INSIDE each engine. Oracle parses with
# native strptime.
def _parse_datetime_sql() -> str:
    from ..functions.datetime import (
        format_datetime_expr as f,
        parse_datetime_expr as p,
    )

    s = f("ts", "%F %T")
    return f"""
    SELECT event_id,
           {s} AS rendered,
           {p(s, '%F %T')} AS parsed,
           CAST({p(s, '%F %T')} = date_trunc('second', ts) AS INT)
             AS roundtrip_ok
    FROM events
    """


REGISTRY.sql_query(
    "scalar_parse_datetime",
    _parse_datetime_sql(),
    oracle="""
    SELECT event_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS rendered,
           strptime(strftime(ts, '%Y-%m-%d %H:%M:%S'), '%Y-%m-%d %H:%M:%S')
             AS parsed,
           CAST(strptime(strftime(ts, '%Y-%m-%d %H:%M:%S'),
                         '%Y-%m-%d %H:%M:%S') = date_trunc('second', ts)
                AS INT) AS roundtrip_ok
    FROM events
    """,
    tables=["events"],
    tags=["scalar", "datetime", "compat"],
    description="parseDateTime %-pattern inverse: in-engine "
    "format->parse roundtrip == second-truncated original; "
    "to_timestamp translation vs native strptime",
)


# dateDiff / addDays / addMonths / toStartOfWeek arithmetic over
# lineitem's ship/commit/receipt dates (the reference host surface's
# date algebra). Monday-based week start matches ClickHouse's
# toStartOfWeek(ts, 1): Spark date_trunc('week') IS Monday-based;
# DuckDB date_trunc('week') likewise — but the oracle derives it
# independently via the isodow subtraction.
REGISTRY.sql_query(
    "scalar_date_arithmetic",
    """
    SELECT l_orderkey, l_linenumber,
           CAST(datediff(l_shipdate, DATE'1995-01-01') AS INT)
             AS days_since_epoch95,
           CAST(date_add(l_shipdate, 30) AS DATE) AS ship_plus_30,
           CAST(add_months(l_shipdate, 2) AS DATE) AS ship_plus_2m,
           CAST(date_trunc('week', l_shipdate) AS DATE) AS ship_week_start,
           CAST(last_day(l_shipdate) AS DATE) AS ship_month_end
    FROM lineitem
    """,
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(date_diff('day', DATE '1995-01-01', l_shipdate) AS INT)
             AS days_since_epoch95,
           CAST(l_shipdate + INTERVAL 30 DAY AS DATE) AS ship_plus_30,
           CAST(l_shipdate + INTERVAL 2 MONTH AS DATE) AS ship_plus_2m,
           CAST(l_shipdate - (isodow(l_shipdate) - 1) * INTERVAL 1 DAY
                AS DATE) AS ship_week_start,
           CAST(last_day(l_shipdate) AS DATE) AS ship_month_end
    FROM lineitem
    """,
    tables=["lineitem"],
    tags=["scalar", "datetime"],
    description="dateDiff/addDays/addMonths/toStartOfWeek(Monday)/"
    "toLastDayOfMonth over ship dates (driver lineitem carries "
    "l_shipdate only); week start via date_trunc (Spark) vs isodow "
    "subtraction (oracle)",
)
