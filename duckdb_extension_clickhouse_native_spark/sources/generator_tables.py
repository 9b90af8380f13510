"""Generated-relation table functions: numbers(), zeros(), values(),
null() (docs: sql-reference/table-functions/{numbers,zeros,values,null}).

Spark-first: ``spark.range`` IS ClickHouse's ``system.numbers`` — a
parallel leaf with one slice per core, no storage, no shuffle; every
spelling below is a thin projection over it (or a local relation for
literal-sized values()), so Catalyst folds/prunes/broadcasts them like
any other relation.  ``generateRandom`` lives in generate_random.py.

Scale note: ``numbers(0, 10**12)`` plans the same as ``spark.range`` —
Spark splits the range across executors arithmetically; there is no
driver-side materialization at ANY count.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def numbers_table(
    spark: SparkSession,
    a: int,
    b: Optional[int] = None,
    step: int = 1,
) -> DataFrame:
    """``numbers(N)`` / ``numbers(offset, N[, step])``: N rows of the
    UInt64 column ``number`` starting at ``offset``, stride ``step`` —
    ClickHouse's argument order (count-only, or offset then count)."""
    from ..plans.base import ensure_session

    ensure_session(spark)
    if b is None:
        offset, count = 0, int(a)
    else:
        offset, count = int(a), int(b)
    if count < 0:
        raise ValueError(f"numbers(): count must be >= 0, got {count}")
    if step <= 0:
        raise ValueError(f"numbers(): step must be >= 1, got {step}")
    end = offset + count * step
    return spark.range(offset, end, step).select(
        F.col("id").alias("number")
    )


def zeros_table(spark: SparkSession, n: int) -> DataFrame:
    """``zeros(N)``: N rows of the UInt8 column ``zero`` — the cheapest
    possible row generator (ClickHouse uses it for benchmarks)."""
    from ..plans.base import ensure_session

    ensure_session(spark)
    if n < 0:
        raise ValueError(f"zeros(): count must be >= 0, got {n}")
    return spark.range(n).select(
        F.lit(0).cast("smallint").alias("zero")  # UInt8 carrier
    )


def values_table(spark: SparkSession, structure: str, rows) -> DataFrame:
    """``values('a Int32, s String', ...)``: an inline literal relation.

    ``rows`` is either the ClickHouse Values-format STRING
    ``"(1, 'x'), (2, 'y')"`` (decoded by the shared FORMAT Values
    parser — native/valuesformat.py, escaping rules and all) or a
    Python list of tuples.  Literal-sized by definition: enters the
    plan as a local relation Catalyst can fold or broadcast."""
    import io

    import pyarrow as pa

    from ..plans.base import ensure_session
    from .url_table import parse_structure

    ensure_session(spark)
    names_types = parse_structure(structure)
    if isinstance(rows, (str, bytes)):
        from ..native.valuesformat import iter_values_blocks

        raw = rows.encode("utf-8") if isinstance(rows, str) else rows
        blocks = list(iter_values_blocks(io.BytesIO(raw), names_types))
        tbl = pa.Table.from_batches([b.to_record_batch() for b in blocks])
        return spark.createDataFrame(tbl)
    from pyspark.sql.types import StructField, StructType

    from .native_datasource import _ch_to_spark

    schema = StructType(
        [StructField(n, _ch_to_spark(t), True) for n, t in names_types]
    )
    return spark.createDataFrame(list(rows), schema)


def null_table(spark: SparkSession, structure: str) -> DataFrame:
    """``null('structure')``: a typed EMPTY relation (the Null engine —
    reads return nothing; writes into it are discarded, which in
    DataFrame terms is simply not writing)."""
    from pyspark.sql.types import StructField, StructType

    from ..plans.base import ensure_session
    from .native_datasource import _ch_to_spark
    from .url_table import parse_structure

    ensure_session(spark)
    schema = StructType(
        [
            StructField(n, _ch_to_spark(t), True)
            for n, t in parse_structure(structure)
        ]
    )
    return spark.createDataFrame([], schema)


def make_numbers_udtf():
    """SQL spelling ``clickhouse_numbers(offset, count)`` — parity shim
    (rows funnel through one worker; numbers_table/spark.range is the
    scale path, and Spark SQL's own range() exists)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="number bigint")
    class NumbersUDTF:
        def eval(self, a: int, b: Optional[int] = None, step: int = 1):
            offset, count = (0, a) if b is None else (a, b)
            for v in range(offset, offset + count * step, step):
                yield (v,)

    return NumbersUDTF
