"""Spark-side merge/finalize for decoded AggregateFunction states.

ClickHouse pairs state columns with the ``-Merge`` combinator and
``finalizeAggregation`` (docs: sql-reference/aggregate-functions/
combinators#-merge).  This engine decodes states to PLAIN Spark values
(native/aggstate.py): sum -> the accumulator value, avg ->
struct<numerator, denominator>, uniqExact -> array of distinct
elements, argMin/argMax -> struct<result, comparison>.  That makes
both halves expressible as ORDINARY Catalyst expressions — no UDFs,
whole-stage codegen, map-side partial aggregation — which is the
Spark-first analogue of ``sumMerge(col)``:

    df.groupBy("k").agg(merge_agg_state("sum, UInt64", F.col("s")))

scales exactly like any built-in sum: one map-side-combinable shuffle
on the group keys, no state blob ever leaves the executor as Python.

``spec`` below accepts an ``aggstate.AggSpec``, the full
``'AggregateFunction(f, T)'`` spelling, or just the params ``'f, T'``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..native.aggstate import (
    _BIT_FUNCS,
    _SINGLE_VALUE_FUNCS,
    AggSpec,
    parse_agg_spec,
)


def _spec(spec) -> AggSpec:
    if isinstance(spec, AggSpec):
        return spec
    s = str(spec).strip()
    if s.lower().startswith("aggregatefunction(") and s.endswith(")"):
        s = s[s.index("(") + 1 : -1]
    return parse_agg_spec(s)


def _spark_type(ch_t):
    """CHType -> Spark DataType via the shared Arrow mapping."""
    from pyspark.sql.pandas.types import from_arrow_type

    from ..native.types import to_arrow

    return from_arrow_type(to_arrow(ch_t))


def merge_agg_state(spec, col: Column) -> Column:
    """AGGREGATE expression merging decoded states within each group —
    the ``<f>Merge(col)`` analogue.  Use inside ``groupBy().agg()``."""
    sp = _spec(spec)
    f = sp.func
    if f == "count":
        return F.sum(col)
    if f == "sum":
        return F.sum(col)
    if f == "sumWithOverflow":
        # ClickHouse keeps the narrow type and wraps; Spark's sum
        # widens, so cast back (the documented wrap difference: Spark
        # raises/NULLs on overflow under ANSI, CH wraps)
        return F.sum(col).cast(_spark_type(sp.args[0]))
    if f == "avg":
        return F.struct(
            F.sum(col["numerator"]).alias("numerator"),
            F.sum(col["denominator"]).alias("denominator"),
        )
    if f == "min":
        return F.min(col)
    if f == "max":
        return F.max(col)
    if f == "any":
        return F.first(col, ignorenulls=True)
    if f == "anyLast":
        return F.last(col, ignorenulls=True)
    if f == "uniqExact":
        return F.array_sort(
            F.array_distinct(F.flatten(F.collect_list(col)))
        )
    if f == "groupBitAnd":
        return F.bit_and(col)
    if f == "groupBitOr":
        return F.bit_or(col)
    if f == "groupBitXor":
        return F.bit_xor(col)
    if f == "argMin":
        # min_by/max_by skip rows whose ordering value is NULL — which
        # is exactly the empty-state (has=0) encoding
        return F.min_by(col, col["comparison"])
    if f == "argMax":
        return F.max_by(col, col["comparison"])
    raise ValueError(f"no merge expression for agg state {f!r}")


def finalize_agg_state(spec, col: Column) -> Column:
    """Scalar expression turning a (merged) state into the function's
    final value — the ``finalizeAggregation(col)`` analogue."""
    sp = _spec(spec)
    f = sp.func
    if f in ("count", "sum", "sumWithOverflow") or f in _BIT_FUNCS:
        return col
    if f == "avg":
        return col["numerator"] / col["denominator"]
    if f in _SINGLE_VALUE_FUNCS:
        return col
    if f == "uniqExact":
        return F.size(col).cast("long")
    if f in ("argMin", "argMax"):
        return col["result"]
    raise ValueError(f"no finalize expression for agg state {f!r}")
