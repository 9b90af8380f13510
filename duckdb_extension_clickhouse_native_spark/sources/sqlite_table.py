"""ClickHouse ``sqlite('db_path', 'table')`` table function (docs:
sql-reference/table-functions/sqlite) — read a SQLite database file.

Spark-first shape: a Python DataSource whose executor task opens the
file with the stdlib ``sqlite3`` module (read-only URI mode) and emits
Arrow batches.  A SQLite file is a single-node B-tree — there is no
server-side split to parallelize against, so the scan is ONE input
partition by design (ClickHouse's sqlite() is likewise single-stream);
at-scale parallelism comes from MANY database files (pass a list of
paths — one partition each) or from converting to a columnar store.

Type mapping follows SQLite's declared-affinity rules the way
ClickHouse maps them: INT* -> Int64, REAL/FLOA/DOUB/NUMERIC/DEC ->
Float64, BLOB -> String (utf-8 with replacement), everything else
(TEXT/CHAR/CLOB/no declared type) -> String.  All columns are
nullable (SQLite constraints are advisory at this boundary).

The write half — ``sqlite_insert(df, db, table)`` — appends via
executemany on ONE executor task (the single-file constraint again),
creating the table from the DataFrame schema when absent.
"""

from __future__ import annotations

import re
from typing import Iterator, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

_IDENT_OK = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def _quote_ident(name: str) -> str:
    """Quote a SQLite identifier; refuse control characters outright
    (a table name is configuration, not data — fail loudly)."""
    if _IDENT_OK.match(name):
        return name
    if '"' in name or "\x00" in name or "\n" in name:
        raise ValueError(f"sqlite(): unsupported identifier {name!r}")
    return f'"{name}"'


def _affinity_to_spark(decl: Optional[str]):
    """SQLite declared-type affinity -> Spark type (the documented
    affinity rules: INT anywhere -> INTEGER; TEXT/CHAR/CLOB -> TEXT;
    BLOB/empty -> BLOB; REAL/FLOA/DOUB -> REAL; else NUMERIC)."""
    from pyspark.sql.types import DoubleType, LongType, StringType

    d = (decl or "").upper()
    if "INT" in d:
        return LongType()
    if any(k in d for k in ("CHAR", "CLOB", "TEXT")):
        return StringType()
    if not d or "BLOB" in d:
        return StringType()
    if any(k in d for k in ("REAL", "FLOA", "DOUB", "NUMERIC", "DEC")):
        return DoubleType()
    return StringType()


def _connect_ro(db_path: str):
    import sqlite3

    return sqlite3.connect(f"file:{db_path}?mode=ro", uri=True)


def _table_schema(db_path: str, table: str):
    from pyspark.sql.types import StructField, StructType

    con = _connect_ro(db_path)
    try:
        cols = con.execute(
            f"PRAGMA table_info({_quote_ident(table)})"
        ).fetchall()
        if not cols:
            raise ValueError(
                f"sqlite(): no such table {table!r} in {db_path!r}"
            )
        return StructType(
            [
                StructField(name, _affinity_to_spark(decl), True)
                for _cid, name, decl, _nn, _dflt, _pk in cols
            ]
        )
    finally:
        con.close()


class _SqlitePartition(InputPartition):
    def __init__(self, db_path: str):
        self.db_path = db_path


class _SqliteReader(DataSourceReader):
    def __init__(self, options: dict, plan_schema):
        self.paths = [
            p.strip()
            for p in (options.get("path") or "").split(",")
            if p.strip()
        ]
        if not self.paths:
            raise ValueError("clickhouse_sqlite requires a path option")
        self.table = options.get("table") or ""
        if not self.table:
            raise ValueError("clickhouse_sqlite requires a table option")
        self.plan_schema = plan_schema
        self.batch_rows = int(options.get("batch_rows") or 65_536)

    def partitions(self):
        return [_SqlitePartition(p) for p in self.paths]

    def read(self, partition: _SqlitePartition) -> Iterator:
        import pyarrow as pa
        from pyspark.sql.pandas.types import to_arrow_schema

        arrow_schema = to_arrow_schema(self.plan_schema)
        names = [f.name for f in arrow_schema]
        con = _connect_ro(partition.db_path)
        try:
            sel = ", ".join(_quote_ident(n) for n in names)
            cur = con.execute(
                f"SELECT {sel} FROM {_quote_ident(self.table)}"
            )
            while True:
                rows = cur.fetchmany(self.batch_rows)
                if not rows:
                    return
                cols = list(zip(*rows)) if rows else [[] for _ in names]
                arrays = []
                for i, f in enumerate(arrow_schema):
                    want_str = pa.types.is_string(f.type)
                    vals = []
                    for v in cols[i]:
                        if isinstance(v, bytes):
                            v = v.decode("utf-8", "replace")
                        elif (
                            want_str
                            and v is not None
                            and not isinstance(v, str)
                        ):
                            # SQLite columns are dynamically typed: an
                            # undeclared/TEXT column can still hold
                            # numbers — render them, don't crash
                            v = str(v)
                        vals.append(v)
                    arrays.append(pa.array(vals, type=f.type))
                yield pa.RecordBatch.from_arrays(arrays, names)
        finally:
            con.close()


class ClickHouseSqliteDataSource(DataSource):
    """``spark.read.format("clickhouse_sqlite").option("path", db)
    .option("table", t).load()``"""

    @classmethod
    def name(cls) -> str:
        return "clickhouse_sqlite"

    def schema(self):
        memo = getattr(self, "_schema_memo", None)
        if memo is not None:
            return memo
        opts = dict(self.options)
        paths = [
            p.strip()
            for p in (opts.get("path") or "").split(",")
            if p.strip()
        ]
        if not paths:
            raise ValueError("clickhouse_sqlite requires a path option")
        table = opts.get("table") or ""
        if not table:
            raise ValueError("clickhouse_sqlite requires a table option")
        self._schema_memo = _table_schema(paths[0], table)
        return self._schema_memo

    def reader(self, schema) -> _SqliteReader:
        return _SqliteReader(dict(self.options), schema)


def sqlite_table(spark: SparkSession, db_path: str, table: str) -> DataFrame:
    """The ``sqlite(db_path, table)`` table function as a DataFrame."""
    from ..plans.base import ensure_session

    ensure_session(spark)
    return (
        spark.read.format("clickhouse_sqlite")
        .option("path", db_path)
        .option("table", table)
        .load()
    )


def sqlite_insert(df: DataFrame, db_path: str, table: str) -> int:
    """``INSERT INTO FUNCTION sqlite(db, table)``: append the DataFrame
    through ONE executor task (a SQLite file takes one writer).  The
    table is created from the DataFrame schema when absent (Int/Long ->
    INTEGER, Float/Double -> REAL, else TEXT).  Returns rows written."""
    from pyspark.sql.types import (
        ByteType,
        DoubleType,
        FloatType,
        IntegerType,
        LongType,
        ShortType,
    )

    cols = df.schema.fields
    col_defs = []
    for f in cols:
        if isinstance(
            f.dataType, (ByteType, ShortType, IntegerType, LongType)
        ):
            t = "INTEGER"
        elif isinstance(f.dataType, (FloatType, DoubleType)):
            t = "REAL"
        else:
            t = "TEXT"
        col_defs.append(f"{_quote_ident(f.name)} {t}")
    ddl = (
        f"CREATE TABLE IF NOT EXISTS {_quote_ident(table)} "
        f"({', '.join(col_defs)})"
    )
    names = [f.name for f in cols]
    ins = (
        f"INSERT INTO {_quote_ident(table)} "
        f"({', '.join(_quote_ident(n) for n in names)}) "
        f"VALUES ({', '.join('?' for _ in names)})"
    )

    def write_all(batches):
        import sqlite3

        import pyarrow as pa_exec

        con = sqlite3.connect(db_path)
        n = 0
        try:
            con.execute(ddl)
            for b in batches:
                rows = list(
                    zip(*[b.column(i).to_pylist() for i in range(b.num_columns)])
                ) if b.num_columns else []
                con.executemany(ins, rows)
                n += b.num_rows
            con.commit()
        finally:
            con.close()
        yield pa_exec.RecordBatch.from_arrays(
            [pa_exec.array([n], type=pa_exec.int64())], ["rows"]
        )

    out = df.repartition(1).mapInArrow(write_all, "rows bigint")
    return int(out.collect()[0]["rows"])
