"""ClickHouse ``generateRandom(structure[, seed])`` table function
(docs: sql-reference/table-functions/generate) — DETERMINISTIC
re-expression.

ClickHouse's generator takes a seed but its stream is not stable
across server versions; for an engine whose correctness story is
cross-engine hash comparison, a documented deterministic generator is
strictly more useful.  Per column ``ci`` and row ``id``::

    v(id, ci) = (id*1103515245 + 12345 + (seed + ci*131)*2654435761)
                 % 2^31

(the 31-bit LCG family the tf_numbers_lcg entry pinned — every term
stays far below 2^63, so ANSI-mode Spark and DuckDB agree exactly),
then a per-type map: ints fold into their range, Float64 divides by
2^31 (a power of two — IEEE-exact on both engines), String/Bool/Date
derive arithmetically, Array(T) draws its length from v and its
elements from a j-indexed sub-stream, Nullable(T) nulls every 11th
draw.  The SAME expression tree renders for Spark and DuckDB
(``dialect``), so the conformance oracle re-generates identical data
from scratch — nothing is compared against a stored fixture.

Spark-first shape: ``spark.range(n)`` is the distributed row source
(one narrow map stage, no shuffle, scales to any n by partition
count); every generator column is whole-stage-codegen arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_M31 = 2_147_483_648  # 2^31


def _v_expr(idcol: str, ci: int, seed: int) -> str:
    mix = (seed + ci * 131) * 2_654_435_761 % (1 << 62)
    return f"(({idcol} * 1103515245 + 12345 + {mix}) % {_M31})"


def _elem_expr(v: str, j: str) -> str:
    # sub-stream for array elements: reuse the LCG step keyed by (v, j).
    # j arrives as INT from Spark's sequence() — widen before the
    # multiply or ANSI mode overflows int32 at j >= 2
    return f"(({v} + CAST({j} AS BIGINT) * 1103515245) % {_M31})"


def _typed(v: str, t, dialect: str) -> str:
    """Map a 31-bit draw ``v`` to a value of CHType ``t`` in the given
    SQL dialect ('spark' | 'duckdb')."""
    b = t.base
    if b == "UInt8":
        return f"CAST({v} % 256 AS {'SMALLINT' if dialect == 'duckdb' else 'SHORT'})"
    if b == "Int8":
        return f"CAST({v} % 256 - 128 AS {'TINYINT' if dialect == 'duckdb' else 'BYTE'})"
    if b == "UInt16":
        return f"CAST({v} % 65536 AS INT)"
    if b == "Int16":
        return f"CAST({v} % 65536 - 32768 AS SMALLINT)"
    if b in ("UInt32", "Int64", "UInt64"):
        return f"CAST({v} AS BIGINT)"
    if b == "Int32":
        return f"CAST({v} - 1073741824 AS INT)"
    if b == "Float64":
        return f"(CAST({v} AS DOUBLE) / {_M31})"
    if b == "String":
        if dialect == "duckdb":
            return f"('s' || CAST({v} % 1000000 AS VARCHAR))"
        return f"CONCAT('s', CAST({v} % 1000000 AS STRING))"
    if b == "Bool":
        return f"({v} % 2 = 1)"
    if b == "Date":
        if dialect == "duckdb":
            return f"(DATE '1970-01-01' + CAST({v} % 25000 AS INTEGER))"
        return f"DATE_ADD(DATE'1970-01-01', CAST({v} % 25000 AS INT))"
    if b == "Array" and t.inner is not None:
        ln = f"({v} % 4)"
        inner = _typed(_elem_expr(v, "j"), t.inner, dialect)
        if dialect == "duckdb":
            return f"list_transform(range(1, {ln} + 1), j -> {inner})"
        # NOT sequence(1, ln): Spark infers step -1 when ln = 0 and
        # yields the DESCENDING [1, 0] instead of an empty array —
        # generate the max length and slice (slice(_, 1, 0) = empty,
        # type-stable across CASE-free codegen)
        return f"slice(transform(sequence(1, 3), j -> {inner}), 1, {ln})"
    raise ValueError(
        f"generateRandom: unsupported column type {t.name} (supported: "
        "U/Int8-64, Float64, String, Bool, Date, Array(T), Nullable(T))"
    )


def genrand_select_exprs(
    structure: str, seed: int, dialect: str, idcol: str = "id"
) -> list:
    """One SELECT expression per structure column, shared between the
    Spark plan and the DuckDB oracle."""
    from .url_table import parse_structure

    out = []
    for ci, (name, t) in enumerate(parse_structure(structure)):
        v = _v_expr(idcol, ci, seed)
        base_t = t
        nullable = t.nullable
        if nullable:
            import copy

            base_t = copy.copy(t)
            base_t.nullable = False
        expr = _typed(v, base_t, dialect)
        if nullable:
            expr = f"CASE WHEN {v} % 11 = 0 THEN NULL ELSE {expr} END"
        out.append(f"{expr} AS {name}")
    return out


def generate_random_table(
    spark: SparkSession, structure: str, n: int, seed: int = 0
) -> DataFrame:
    """``generateRandom('name Type, ...', seed)`` as a DataFrame of
    ``n`` rows — deterministic, distributed (spark.range), pure
    codegen arithmetic."""
    from ..plans.base import ensure_session

    ensure_session(spark)
    exprs = genrand_select_exprs(structure, seed, "spark")
    return spark.range(n).selectExpr(*exprs)


def genrand_oracle_source(structure: str, n: int, seed: int) -> str:
    """DuckDB FROM-clause regenerating the identical table."""
    exprs = genrand_select_exprs(structure, seed, "duckdb", idcol="rid")
    cols = ",\n           ".join(exprs)
    return (
        f"(SELECT {cols} FROM (SELECT range AS rid FROM range(0, {n})))"
    )
