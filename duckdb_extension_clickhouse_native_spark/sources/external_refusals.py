"""Named refusals for external-server table functions this engine
cannot honestly implement in this environment.

ClickHouse ships table functions that open live connections to other
database servers (docs: sql-reference/table-functions/{mysql,
postgresql,mongodb,redis,jdbc,odbc}) and one that executes arbitrary
local programs (``executable``).  This engine's policy mirrors the
rest of the codebase: anything it cannot do FULLY and VERIFIABLY
refuses loudly BY NAME with the working alternative in the message —
never a silent stub, never a half-implementation that fails deep in a
scan.

* ``mysql()`` / ``postgresql()`` — need server drivers absent here by
  design; Spark's own JDBC source (``spark.read.jdbc``) is the
  at-scale path once a driver jar is on the classpath, and it gets
  predicate pushdown + split reads for free.
* ``mongodb()`` / ``redis()`` — need client libraries absent here;
  the documented alternative is exporting to any wire format this
  engine reads (JSONEachRow is the natural Mongo shape).
* ``jdbc()`` / ``odbc()`` — bridge daemons; same JDBC alternative.
* ``executable()`` / ``executablePool()`` — arbitrary-program
  execution is refused AS POLICY, not capability (a data engine
  spawning shell commands from SQL is an injection surface;
  ClickHouse itself gates it behind server-side script whitelists).

``sqlite()`` is NOT here — stdlib sqlite3 makes it fully
implementable, and sources/sqlite_table.py does.  ``remote()`` /
``remoteSecure()`` (ClickHouse-to-ClickHouse) are implemented over
the scan source in table_functions.py.
"""

from __future__ import annotations

_ALTERNATIVES = {
    "mysql": (
        "use Spark's own JDBC source (spark.read.jdbc with a MySQL "
        "driver jar) — it pushes predicates and splits reads; or export "
        "to a wire format this engine reads (Parquet/CSV/JSONEachRow)"
    ),
    "postgresql": (
        "use Spark's own JDBC source (spark.read.jdbc with a PostgreSQL "
        "driver jar); or export to Parquet/CSV/JSONEachRow and read via "
        "file()/url()/s3()"
    ),
    "mongodb": (
        "export the collection as JSONEachRow/NDJSON (mongoexport) and "
        "read it via file()/url()/s3() — schema inference handles the "
        "typing"
    ),
    "redis": (
        "export to CSV/JSONEachRow and read via file(); key-value "
        "lookups belong in a broadcast join, not a table scan"
    ),
    "jdbc": (
        "use Spark's own JDBC source (spark.read.jdbc) — no bridge "
        "daemon needed"
    ),
    "odbc": (
        "use Spark's own JDBC source with the database's JDBC driver"
    ),
    "executable": (
        "refused as policy, not capability: arbitrary-program execution "
        "from SQL is an injection surface (ClickHouse gates it behind "
        "server-side script whitelists); implement the transform as a "
        "Pandas UDF / mapInArrow instead"
    ),
    "executablePool": (
        "refused as policy — see executable(); use a Pandas UDF / "
        "mapInArrow transform"
    ),
    "hudi": (
        "Hudi's timeline/MOR-compaction layout is not implemented; "
        "deltaLake() and iceberg() cover the lakehouse formats this "
        "engine reads — or read a Hudi COW table's latest file slices "
        "directly via file('*.parquet') if you know the slice layout"
    ),
}


def _refuse(name: str):
    def fn(*_a, **_k):
        raise NotImplementedError(
            f"{name}() is not implemented in this engine: "
            f"{_ALTERNATIVES[name]}"
        )

    fn.__name__ = f"{name}_table"
    fn.__doc__ = (
        f"ClickHouse ``{name}()`` table function — named refusal. "
        f"{_ALTERNATIVES[name]}"
    )
    return fn


mysql_table = _refuse("mysql")
postgresql_table = _refuse("postgresql")
mongodb_table = _refuse("mongodb")
redis_table = _refuse("redis")
jdbc_table = _refuse("jdbc")
odbc_table = _refuse("odbc")
executable_table = _refuse("executable")
executable_pool_table = _refuse("executablePool")
hudi_table = _refuse("hudi")
