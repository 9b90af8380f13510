#!/usr/bin/env python
"""Differential SQL fuzzer: generate random queries from a
PARITY-SAFE grammar (a SQL subset whose semantics are bit-identical
in Spark and DuckDB by construction), run the SAME text on both
engines over the same parquet, and hash-compare — the randomized
complement of the 174 hand-written conformance queries.

Parity-safe means every construct avoids the known divergence
classes the conformance corpus documents:
  * no double->DECIMAL casts (HALF_UP vs HALF_EVEN) — double sums go
    through FLOOR(col * 10^k) fixed-point BIGINTs;
  * no LIMIT (ties would make row sets order-dependent) — the compare
    is order-insensitive already;
  * only ASCII string comparisons (binary collation in both);
  * TIMESTAMP literals in the shared 'YYYY-MM-DD HH:MM:SS' form.

Shapes: single-table filter+project, DISTINCT projection, grouped
aggregate (optionally with HAVING), keyed two-table join aggregate,
set operations (UNION / INTERSECT / EXCEPT — all DISTINCT semantics
in both engines), and window functions (ROW_NUMBER / running SUM
over a unique total order, so every value is deterministic). Seeded
RNG -> reproducible; tools-invocation runs a batch and prints
failures with their seeds.

Run: python tools/sql_fuzz.py [n_queries] [base_seed] [sf_dir]
"""

from __future__ import annotations

import os
import random
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

# tables with a VERIFIED-unique key (the synthetic lineitem contains
# fully duplicated rows — no column set is unique there, so it cannot
# host deterministic ROW_NUMBER/running-sum windows; found by this
# fuzzer's own first widened run, seeds 91xxx)
UNIQUE_KEY = {
    "orders": ["o_orderkey"],
    "customer": ["c_custkey"],
    "part": ["p_partkey"],
    # 1:1 with orders, so o_orderkey stays unique — windows over this
    # surface exercise NULL partition keys (both engines put all NULLs
    # in one partition; the total order below them is still unique)
    "orders_nulls": ["o_orderkey"],
}

TABLES = {
    "orders_nulls": {
        "ints": ["o_orderkey", "o_custkey"],
        "doubles": ["price_n"],
        "strings": ["status_n", "prio_n"],
        "ts": [],
        "group": ["status_n", "prio_n"],
        "int_range": (0, 15000),
        "str_lits": ["F", "P", "1-URGENT", "3-MEDIUM", "5-LOW"],
        "dbl_range": (0.0, 500000.0),
    },
    "lineitem": {
        "ints": ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"],
        "doubles": ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "strings": ["l_returnflag", "l_linestatus"],
        "ts": ["l_shipdate"],
        "group": ["l_returnflag", "l_linestatus", "l_suppkey"],
        "int_range": (0, 15000),
        "str_lits": ["A", "N", "R", "O", "F"],
        "dbl_range": (0.0, 100.0),
    },
    "orders": {
        "ints": ["o_orderkey", "o_custkey"],
        "doubles": ["o_totalprice"],
        "strings": ["o_orderstatus", "o_orderpriority"],
        "ts": ["o_orderdate"],
        "group": ["o_orderstatus", "o_orderpriority", "o_custkey"],
        "int_range": (0, 15000),
        "str_lits": ["O", "F", "P", "1-URGENT", "3-MEDIUM", "5-LOW"],
        "dbl_range": (0.0, 500000.0),
    },
    "customer": {
        "ints": ["c_custkey", "c_nationkey"],
        "doubles": ["c_acctbal"],
        "strings": ["c_mktsegment", "c_name"],
        "ts": [],
        "group": ["c_mktsegment", "c_nationkey"],
        "int_range": (0, 1500),
        "str_lits": ["AUTOMOBILE", "BUILDING", "FURNITURE", "MACHINERY", "HOUSEHOLD"],
        "dbl_range": (-1000.0, 10000.0),
    },
    "part": {
        "ints": ["p_partkey", "p_size"],
        "doubles": ["p_retailprice"],
        "strings": ["p_brand", "p_type", "p_name"],
        "ts": [],
        "group": ["p_brand", "p_size"],
        "int_range": (0, 2000),
        "str_lits": ["Brand#11", "Brand#23", "Brand#35", "Brand#44"],
        "dbl_range": (800.0, 2100.0),
    },
}


# NULL-bearing derived surface: the synthetic tables contain no NULLs,
# so three-valued logic (NULL grouping keys, COUNT(col) skipping,
# IS [NOT] NULL filters, set ops over NULL rows) was under-fuzzed.
# One view, SAME text on both engines.
NULL_VIEW_SQL = """
    SELECT o_orderkey, o_custkey,
           NULLIF(o_orderstatus, 'O') AS status_n,
           CASE WHEN o_orderkey % 7 = 0 THEN NULL
                ELSE o_orderpriority END AS prio_n,
           CASE WHEN o_custkey % 5 = 0 THEN NULL
                ELSE o_totalprice END AS price_n
    FROM orders
"""

JOINS = [
    ("orders", "customer", "o_custkey", "c_custkey"),
    ("lineitem", "orders", "l_orderkey", "o_orderkey"),
    ("lineitem", "part", "l_partkey", "p_partkey"),
]


def _pred(rng: random.Random, t: str, alias: str = "") -> str:
    spec = TABLES[t]
    p = f"{alias}." if alias else ""
    kind = rng.choice(["int", "int", "str", "dbl"] + (["ts"] if spec["ts"] else []))
    if kind == "int":
        c = rng.choice(spec["ints"])
        lo, hi = spec["int_range"]
        v = rng.randint(lo, hi)
        op = rng.choice(["<", "<=", ">", ">=", "="])
        if rng.random() < 0.2:
            vals = ", ".join(str(rng.randint(lo, hi)) for _ in range(rng.randint(2, 5)))
            return f"{p}{c} IN ({vals})"
        return f"{p}{c} {op} {v}"
    if kind == "str":
        c = rng.choice(spec["strings"])
        if rng.random() < 0.25:
            return f"{p}{c} IS {rng.choice(['NULL', 'NOT NULL'])}"
        v = rng.choice(spec["str_lits"])
        op = rng.choice(["=", "<>", ">", "<"])
        return f"{p}{c} {op} '{v}'"
    if kind == "dbl":
        c = rng.choice(spec["doubles"])
        lo, hi = spec["dbl_range"]
        v = round(rng.uniform(lo, hi), 3)
        op = rng.choice(["<", "<=", ">", ">="])
        return f"{p}{c} {op} {v}"
    c = rng.choice(spec["ts"])
    y = rng.randint(1995, 2000)
    m = rng.randint(1, 12)
    d = rng.randint(1, 28)
    op = rng.choice(["<", ">="])
    return f"{p}{c} {op} TIMESTAMP '{y:04d}-{m:02d}-{d:02d} 00:00:00'"


def _where(rng: random.Random, t: str, alias: str = "") -> str:
    n = rng.randint(1, 3)
    parts = [_pred(rng, t, alias) for _ in range(n)]
    glue = rng.choice([" AND ", " OR "])
    return "(" + glue.join(parts) + ")"


def _aggs(rng: random.Random, t: str, alias: str = "") -> list[str]:
    spec = TABLES[t]
    p = f"{alias}." if alias else ""
    out = ["COUNT(*) AS n_rows"]
    for i in range(rng.randint(1, 3)):
        kind = rng.choice(["min_int", "max_int", "sum_int", "min_str", "sum_dbl_fp"])
        if kind == "min_int":
            c = rng.choice(spec["ints"])
            out.append(f"MIN({p}{c}) AS agg{i}_min_{c}")
        elif kind == "max_int":
            c = rng.choice(spec["ints"])
            out.append(f"MAX({p}{c}) AS agg{i}_max_{c}")
        elif kind == "sum_int":
            c = rng.choice(spec["ints"])
            out.append(f"CAST(SUM({p}{c}) AS BIGINT) AS agg{i}_sum_{c}")
        elif kind == "min_str":
            c = rng.choice(spec["strings"])
            out.append(f"MIN({p}{c}) AS agg{i}_min_{c}")
        else:
            c = rng.choice(spec["doubles"])
            out.append(
                f"CAST(SUM(CAST(FLOOR({p}{c} * 10000) AS BIGINT)) AS BIGINT)"
                f" AS agg{i}_sumfp_{c}"
            )
    return out


def gen_query(seed: int) -> str:
    rng = random.Random(seed)
    shape = rng.choice(
        ["project", "agg", "agg", "join_agg", "distinct", "setop", "window",
         "rollup", "scalar", "exists", "full_outer", "group_all",
         "moving_frame", "rank_algebra", "range_cume", "pad_split",
         "ties_boundary", "timing_grid"]
    )
    if shape == "pad_split":
        # engine-portable string pad/split subset (the r12c family):
        # lpad/rpad truncate-or-pad identically, split_part returns ''
        # past the last part in BOTH engines. ENGINE DIVERGENCE found
        # by this shape (seed 563642): split_part(NULL, sep, i) is
        # NULL in Spark but '' in DuckDB — fenced with coalesce, the
        # Date.now-class treatment (lpad/concat_ws agree on NULLs)
        t = rng.choice(list(TABLES))
        spec = TABLES[t]
        s = rng.choice(spec["strings"])
        k = rng.choice(spec["ints"])
        width = rng.randint(3, 20)
        idx = rng.randint(1, 4)
        sep = rng.choice(["' '", "'-'", "'a'"])
        fn = rng.choice(["lpad", "rpad"])
        return (
            f"SELECT {k}, {fn}({s}, {width}, '*') AS padded, "
            f"split_part(coalesce({s}, ''), {sep}, {idx}) AS piece, "
            f"concat_ws('|', {s}, CAST({k} AS STRING)) AS joined "
            f"FROM {t} WHERE {_where(rng, t)}"
        )
    if shape == "ties_boundary":
        # WITH TIES / rank-boundary semantics: every row tied with the
        # k-th key survives in both engines (the r12e topk_with_ties
        # lowering); modulo fold manufactures real boundary ties
        t = rng.choice(list(TABLES))
        spec = TABLES[t]
        v = rng.choice(spec["ints"])
        g = rng.choice(spec["group"])
        p = rng.choice([7, 13, 31])
        kk = rng.randint(2, 12)
        return (
            f"SELECT {g} AS g, COUNT(*) AS n_rows, "
            f"CAST(SUM({v} % {p}) AS BIGINT) AS key_sum FROM ("
            f"SELECT {g}, {v}, RANK() OVER (ORDER BY {v} % {p}) AS r "
            f"FROM {t} WHERE {_where(rng, t)}) q "
            f"WHERE r <= {kk} GROUP BY {g}"
        )
    if shape == "timing_grid":
        # bounded-grid quantile walk (the r12c quantileTiming shape):
        # grouped counts + cumulative sum, type-1 pick — CEIL/OVER
        # frame defaults must agree at every tie
        t = rng.choice(list(TABLES))
        spec = TABLES[t]
        v = rng.choice(spec["ints"])
        cell = rng.choice([16, 64, 300])
        q = rng.choice(["0.5", "0.9", "0.99"])
        return (
            f"SELECT MIN(CASE WHEN cum >= CEIL({q} * n) THEN t END) AS qv, "
            f"CAST(MIN(n) AS BIGINT) AS n_rows FROM ("
            f"SELECT t, SUM(cnt) OVER (ORDER BY t) AS cum, "
            f"SUM(cnt) OVER () AS n FROM ("
            f"SELECT CAST(FLOOR(({v} % 40000) / {cell}) * {cell} AS BIGINT) "
            f"AS t, COUNT(*) AS cnt FROM {t} "
            f"WHERE {_where(rng, t)} AND {v} >= 0 GROUP BY 1) c) w"
        )
    if shape == "rank_algebra":
        # tie-corrected rank algebra (the r10 mannWhitneyU shape):
        # 2*RANK() + COUNT(*) OVER (PARTITION BY v) - 1 is the
        # 2x-scaled average rank — exact integers, tie semantics must
        # agree between engines
        t = rng.choice(list(TABLES))
        spec = TABLES[t]
        v = rng.choice(spec["ints"])
        g = rng.choice(spec["group"])
        return (
            f"SELECT {g} AS g, "
            f"CAST(SUM(2 * r + tc - 1) AS BIGINT) AS rank2_sum, "
            f"COUNT(*) AS n_rows FROM ("
            f"SELECT {g}, RANK() OVER (ORDER BY {v}) AS r, "
            f"COUNT(*) OVER (PARTITION BY {v}) AS tc "
            f"FROM {t} WHERE {_where(rng, t)}) q GROUP BY {g}"
        )
    if shape == "range_cume":
        # RANGE-frame cumulative counts (the r10 KS shape): at a tied
        # ORDER BY value the frame must include ALL peers in both
        # engines
        t = rng.choice(list(TABLES))
        spec = TABLES[t]
        v = rng.choice(spec["ints"])
        c = rng.choice(spec["ints"])
        return (
            f"SELECT CAST(MAX(f) AS BIGINT) AS max_cume, "
            f"CAST(MIN(f) AS BIGINT) AS min_cume, COUNT(*) AS n_rows "
            f"FROM (SELECT SUM(CASE WHEN {c} % 2 = 0 THEN 1 ELSE 0 END) "
            f"OVER (ORDER BY {v} RANGE BETWEEN UNBOUNDED PRECEDING AND "
            f"CURRENT ROW) AS f FROM {t} WHERE {_where(rng, t)}) q"
        )
    if shape == "exists":
        # (NOT) EXISTS correlated subquery — the decorrelation path
        big, dim, bk, dk = rng.choice(JOINS)
        neg = "NOT " if rng.random() < 0.5 else ""
        cols = sorted(set(rng.sample(
            TABLES[big]["ints"] + TABLES[big]["strings"], rng.randint(1, 3))))
        return (
            f"SELECT {', '.join(cols)} FROM {big} a "
            f"WHERE {_where(rng, big, 'a')} AND {neg}EXISTS ("
            f"SELECT 1 FROM {dim} b WHERE b.{dk} = a.{bk} "
            f"AND {_where(rng, dim, 'b')})"
        )
    if shape == "full_outer":
        # FULL OUTER with grouped counts: null-extension on both sides
        # must agree; COUNT(col) (null-skipping) probes the extension
        big, dim, bk, dk = rng.choice(JOINS)
        g = rng.choice(TABLES[dim]["group"])
        return (
            f"SELECT b.{g} AS g, COUNT(*) AS n_rows, "
            f"COUNT(a.{bk}) AS n_left, COUNT(b.{dk}) AS n_right "
            f"FROM (SELECT * FROM {big} WHERE {_where(rng, big)}) a "
            f"FULL OUTER JOIN (SELECT * FROM {dim} WHERE {_where(rng, dim)}) b "
            f"ON a.{bk} = b.{dk} GROUP BY b.{g}"
        )
    if shape == "rollup":
        # GROUPING() disambiguates rollup NULLs from data NULLs; the
        # compare is order-insensitive so cross-engine NULL placement
        # in ORDER BY cannot bite here. HAVING COUNT(*) > 0 fences a
        # REAL engine divergence this shape's first run found (seed
        # 130493): on EMPTY input DuckDB emits the ANSI grand-total
        # grouping-set row (count 0), Spark emits no rows — a random
        # WHERE can empty the input, so the divergent row is excluded
        # like the other documented divergence classes above.
        t = rng.choice(list(TABLES))
        spec = TABLES[t]
        g1, g2 = rng.sample(spec["group"], 2)
        c = rng.choice(spec["ints"])
        return (
            f"SELECT {g1}, {g2}, "
            f"CAST(GROUPING({g1}) AS INT) AS gr1, "
            f"CAST(GROUPING({g2}) AS INT) AS gr2, "
            f"COUNT(*) AS n_rows, CAST(SUM({c}) AS BIGINT) AS s_{c} "
            f"FROM {t} WHERE {_where(rng, t)} "
            f"GROUP BY ROLLUP ({g1}, {g2}) HAVING COUNT(*) > 0"
        )
    if shape == "scalar":
        # string/CASE/int-arithmetic scalar functions — ASCII-only
        # corpus, so UPPER/LENGTH/SUBSTR semantics agree byte-for-byte
        t = rng.choice(list(TABLES))
        spec = TABLES[t]
        s = rng.choice(spec["strings"])
        i1, i2 = rng.choice(spec["ints"]), rng.choice(spec["ints"])
        exprs = [f"{s} AS raw_s", f"{i1} AS raw_i"]
        pool = [
            f"UPPER({s}) AS up_s",
            f"LOWER({s}) AS low_s",
            f"CAST(LENGTH({s}) AS INT) AS len_s",
            f"SUBSTR({s}, 1, {rng.randint(1, 5)}) AS sub_s",
            # COALESCE inside CONCAT: a REAL divergence this surface's
            # first run found (seeds 1704xx) — Spark CONCAT is
            # NULL-PROPAGATING (any NULL arg -> NULL, the ANSI ||
            # behavior), DuckDB's CONCAT function SKIPS NULLs. Fenced
            # like the other documented divergence classes; the
            # conformance corpus only concats non-null values.
            f"CONCAT(COALESCE({s}, ''), '_', COALESCE({s}, '')) AS cat_s",
            f"CAST({i1} % {rng.randint(2, 9)} AS BIGINT) AS mod_i",
            f"CAST({i1} + {i2} AS BIGINT) AS add_i",
            f"CASE WHEN {i1} % 2 = 0 THEN 'even' ELSE 'odd' END AS par_i",
        ]
        exprs += rng.sample(pool, rng.randint(2, 4))
        return f"SELECT {', '.join(exprs)} FROM {t} WHERE {_where(rng, t)}"
    if shape == "project":
        t = rng.choice(list(TABLES))
        spec = TABLES[t]
        cols = sorted(
            set(
                rng.sample(
                    spec["ints"] + spec["strings"] + spec["doubles"],
                    rng.randint(1, 4),
                )
            )
        )
        return f"SELECT {', '.join(cols)} FROM {t} WHERE {_where(rng, t)}"
    if shape == "distinct":
        t = rng.choice(list(TABLES))
        spec = TABLES[t]
        cols = sorted(
            set(rng.sample(spec["group"] + spec["strings"], rng.randint(1, 2)))
        )
        return f"SELECT DISTINCT {', '.join(cols)} FROM {t} WHERE {_where(rng, t)}"
    if shape == "setop":
        t = rng.choice(list(TABLES))
        spec = TABLES[t]
        col = rng.choice(spec["group"])
        op = rng.choice(["UNION", "INTERSECT", "EXCEPT"])
        return (
            f"SELECT {col} FROM {t} WHERE {_where(rng, t)} "
            f"{op} SELECT {col} FROM {t} WHERE {_where(rng, t)}"
        )
    if shape == "group_all":
        # GROUP BY ALL / ORDER BY ALL sugar — identical text in both
        # engines; the compare is order-insensitive so ORDER BY ALL
        # only has to be ACCEPTED, not tie-stable
        t = rng.choice(list(TABLES))
        spec = TABLES[t]
        g1, g2 = rng.sample(spec["group"], 2)
        c = rng.choice(spec["ints"])
        return (
            f"SELECT {g1}, {g2}, COUNT(*) AS n_rows, "
            f"CAST(SUM({c}) AS BIGINT) AS s_{c} "
            f"FROM {t} WHERE {_where(rng, t)} GROUP BY ALL ORDER BY ALL"
        )
    if shape == "moving_frame":
        # bounded ROWS frames (moving sums / min / max) over a
        # verified-unique total order — every frame value deterministic
        t = rng.choice(list(UNIQUE_KEY))
        spec = TABLES[t]
        uk = ", ".join(UNIQUE_KEY[t])
        part = rng.choice(spec["group"])
        c = rng.choice(spec["ints"])
        k = rng.randint(1, 4)
        fn = rng.choice(["SUM", "MIN", "MAX", "COUNT"])
        return (
            f"SELECT {uk}, {part}, "
            f"CAST({fn}({c}) OVER (PARTITION BY {part} ORDER BY {uk} "
            f"ROWS BETWEEN {k} PRECEDING AND CURRENT ROW) AS BIGINT) "
            f"AS mv_{c} "
            f"FROM {t} WHERE {_where(rng, t)}"
        )
    if shape == "window":
        t = rng.choice(list(UNIQUE_KEY))
        spec = TABLES[t]
        uk = ", ".join(UNIQUE_KEY[t])
        part = rng.choice(spec["group"])
        wins = [
            f"ROW_NUMBER() OVER (PARTITION BY {part} ORDER BY {uk}) AS rn"
        ]
        if rng.random() < 0.6:
            c = rng.choice(spec["ints"])
            wins.append(
                f"CAST(SUM({c}) OVER (PARTITION BY {part} ORDER BY {uk} "
                f"ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run_sum_{c}"
            )
        return (
            f"SELECT {uk}, {part}, {', '.join(wins)} "
            f"FROM {t} WHERE {_where(rng, t)}"
        )
    if shape == "agg":
        t = rng.choice(list(TABLES))
        spec = TABLES[t]
        groups = rng.sample(spec["group"], rng.randint(0, 2))
        aggs = _aggs(rng, t)
        sel = ", ".join(groups + aggs)
        gb = f" GROUP BY {', '.join(groups)}" if groups else ""
        having = ""
        if groups and rng.random() < 0.4:
            having = f" HAVING COUNT(*) > {rng.randint(0, 5)}"
        return f"SELECT {sel} FROM {t} WHERE {_where(rng, t)}{gb}{having}"
    big, dim, bk, dk = rng.choice(JOINS)
    groups = rng.sample(TABLES[dim]["group"], rng.randint(0, 1)) + rng.sample(
        TABLES[big]["group"], rng.randint(0, 1)
    )
    qgroups = [
        (f"a.{g}" if g in TABLES[big]["group"] else f"b.{g}") for g in groups
    ]
    aggs = _aggs(rng, big, "a")
    sel = ", ".join(
        [f"{qg} AS {g}" for qg, g in zip(qgroups, groups)] + aggs
    )
    gb = f" GROUP BY {', '.join(qgroups)}" if qgroups else ""
    if rng.random() < 0.3:
        # LEFT JOIN with the dim-side predicate folded into the ON
        # clause (a WHERE on the dim side would silently turn it back
        # into an inner join — the classic trap, worth fuzzing)
        return (
            f"SELECT {sel} FROM {big} a LEFT JOIN {dim} b "
            f"ON a.{bk} = b.{dk} AND {_where(rng, dim, 'b')} "
            f"WHERE {_where(rng, big, 'a')}{gb}"
        )
    return (
        f"SELECT {sel} FROM {big} a JOIN {dim} b ON a.{bk} = b.{dk} "
        f"WHERE {_where(rng, big, 'a')} AND {_where(rng, dim, 'b')}{gb}"
    )


def run_fuzz(spark, con, n: int, base_seed: int, sf_dir: str) -> list[tuple[int, str, str]]:
    """Returns [(seed, sql, mismatch_message)] — empty list == clean."""
    from duckdb_extension_clickhouse_native_spark.plans.base import load_tables
    from oracle_harness import compare

    load_tables(spark, sf_dir, [t for t in TABLES if t != "orders_nulls"])
    spark.sql(
        "CREATE OR REPLACE TEMP VIEW orders_nulls AS " + NULL_VIEW_SQL
    )
    con.execute("CREATE OR REPLACE VIEW orders_nulls AS " + NULL_VIEW_SQL)
    failures = []
    for i in range(n):
        seed = base_seed + i
        sql = gen_query(seed)
        ok, msg = compare(spark.sql(sql), con, sql)
        if not ok:
            failures.append((seed, sql, msg))
    return failures


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    base_seed = int(sys.argv[2]) if len(sys.argv) > 2 else 42_000
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.001"

    from duckdb_extension_clickhouse_native_spark import get_spark
    from oracle_harness import duckdb_connection

    spark = get_spark(app_name="sql-fuzz", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb_connection(sf_dir)
    failures = run_fuzz(spark, con, n, base_seed, sf_dir)
    for seed, sql, msg in failures:
        print(f"SEED {seed} MISMATCH: {msg[:200]}\n  {sql}")
    print(f"fuzzed {n} queries (seeds {base_seed}..{base_seed + n - 1}): "
          f"{len(failures)} mismatches")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
