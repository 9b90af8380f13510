"""numbers()/zeros()/values()/null() generated relations, the sqlite()
table function, and the deltaLake() log-replay reader (r15 fourth
tranche: sources/generator_tables.py, sqlite_table.py, delta_table.py).
"""

from __future__ import annotations

import json
import os
import sqlite3

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from duckdb_extension_clickhouse_native_spark.sources.generator_tables import (
    null_table,
    numbers_table,
    values_table,
    zeros_table,
)


# ------------------------------------------------------------ generators


def test_numbers_spellings(spark):
    assert numbers_table(spark, 5).count() == 5
    df = numbers_table(spark, 10, 4)
    assert [r.number for r in df.collect()] == [10, 11, 12, 13]
    df2 = numbers_table(spark, 100, 3, step=7)
    assert [r.number for r in df2.collect()] == [100, 107, 114]
    assert df.columns == ["number"]
    with pytest.raises(ValueError, match="step"):
        numbers_table(spark, 0, 5, step=0)


def test_numbers_is_a_parallel_range_leaf(spark):
    # the plan must be spark.range (a parallel leaf), not a collected
    # local relation — numbers(10**12) has to plan without materializing
    plan = numbers_table(spark, 10**12).explain_string = None
    df = numbers_table(spark, 10**12)
    s = df._jdf.queryExecution().optimizedPlan().toString()
    assert "Range" in s


def test_zeros(spark):
    df = zeros_table(spark, 4)
    assert df.columns == ["zero"]
    assert [r.zero for r in df.collect()] == [0, 0, 0, 0]


def test_values_from_values_format_string(spark):
    df = values_table(
        spark, "a Int32, s String", "(1, 'x'), (2, 'y\\'z')"
    )
    rows = sorted(map(tuple, df.collect()))
    assert rows == [(1, "x"), (2, "y'z")]


def test_values_from_python_rows(spark):
    df = values_table(spark, "k Int64, v Float64", [(1, 0.5), (2, 1.5)])
    assert sorted(map(tuple, df.collect())) == [(1, 0.5), (2, 1.5)]


def test_null_table_typed_empty(spark):
    df = null_table(spark, "a Int64, s Nullable(String)")
    assert df.count() == 0
    assert [f.name for f in df.schema.fields] == ["a", "s"]


# --------------------------------------------------------------- sqlite


def _make_db(path, rows=20):
    con = sqlite3.connect(path)
    con.execute(
        "CREATE TABLE t (id INTEGER, name TEXT, score REAL, raw BLOB, "
        "untyped)"
    )
    for i in range(rows):
        con.execute(
            "INSERT INTO t VALUES (?, ?, ?, ?, ?)",
            (i, f"n{i}", i * 0.5, b"bytes%d" % i, None if i % 2 else i),
        )
    con.commit()
    con.close()


def test_sqlite_scan_types_and_values(spark, tmp_path):
    from duckdb_extension_clickhouse_native_spark.sources.sqlite_table import (
        sqlite_table,
    )

    db = str(tmp_path / "t.db")
    _make_db(db)
    df = sqlite_table(spark, db, "t")
    assert dict((f.name, f.dataType.simpleString()) for f in df.schema) == {
        "id": "bigint",
        "name": "string",
        "score": "double",
        "raw": "string",
        "untyped": "string",
    }
    rows = {r.id: r for r in df.collect()}
    assert len(rows) == 20
    assert rows[3].name == "n3" and rows[4].score == 2.0
    assert rows[1].raw == "bytes1"
    assert rows[1].untyped is None  # odd ids NULL


def test_sqlite_missing_table_named_error(spark, tmp_path):
    from duckdb_extension_clickhouse_native_spark.sources.sqlite_table import (
        sqlite_table,
    )

    db = str(tmp_path / "t.db")
    _make_db(db, rows=1)
    with pytest.raises(Exception, match="no such table"):
        sqlite_table(spark, db, "nope").collect()


def test_sqlite_insert_roundtrip(spark, tmp_path):
    from duckdb_extension_clickhouse_native_spark.sources.sqlite_table import (
        sqlite_insert,
        sqlite_table,
    )

    db = str(tmp_path / "w.db")
    df = spark.createDataFrame(
        [(1, "a", 0.5), (2, "b", 1.5)], "k long, s string, f double"
    )
    n = sqlite_insert(df, db, "out")
    assert n == 2
    back = sqlite_table(spark, db, "out")
    assert sorted(map(tuple, back.collect())) == [
        (1, "a", 0.5),
        (2, "b", 1.5),
    ]


# ---------------------------------------------------------------- delta


def _write_delta(root, *, partitioned=False):
    """Hand-built Delta table: 3 data files, one later REMOVED by a
    compaction-style commit — log replay must exclude it."""
    os.makedirs(os.path.join(root, "_delta_log"))
    schema_fields = [
        {"name": "k", "type": "long", "nullable": True, "metadata": {}},
        {"name": "v", "type": "string", "nullable": True, "metadata": {}},
    ]
    part_cols = []
    if partitioned:
        schema_fields.append(
            {"name": "p", "type": "integer", "nullable": True, "metadata": {}}
        )
        part_cols = ["p"]
    meta = {
        "metaData": {
            "id": "00000000-0000-0000-0000-000000000000",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps(
                {"type": "struct", "fields": schema_fields}
            ),
            "partitionColumns": part_cols,
            "configuration": {},
        }
    }
    proto = {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}

    def data_file(name, ks, part=None):
        sub = os.path.join(root, os.path.dirname(name))
        if os.path.dirname(name):
            os.makedirs(sub, exist_ok=True)
        pq.write_table(
            pa.table(
                {
                    "k": pa.array(ks, type=pa.int64()),
                    "v": pa.array([f"v{k}" for k in ks]),
                }
            ),
            os.path.join(root, name),
        )
        pv = {"p": str(part)} if part is not None else {}
        return {
            "add": {
                "path": name,
                "partitionValues": pv,
                "size": 1,
                "modificationTime": 0,
                "dataChange": True,
            }
        }

    a1 = data_file(
        "p=0/part-0.parquet" if partitioned else "part-0.parquet",
        [1, 2],
        0 if partitioned else None,
    )
    a2 = data_file(
        "p=1/part-1.parquet" if partitioned else "part-1.parquet",
        [3, 4],
        1 if partitioned else None,
    )
    with open(
        os.path.join(root, "_delta_log", f"{0:020d}.json"), "w"
    ) as f:
        for act in (proto, meta, a1, a2):
            f.write(json.dumps(act) + "\n")
    # commit 1: add a stale file; commit 2: remove it (compaction)
    a3 = data_file(
        "p=0/part-2.parquet" if partitioned else "part-2.parquet",
        [99],
        0 if partitioned else None,
    )
    with open(
        os.path.join(root, "_delta_log", f"{1:020d}.json"), "w"
    ) as f:
        f.write(json.dumps(a3) + "\n")
    with open(
        os.path.join(root, "_delta_log", f"{2:020d}.json"), "w"
    ) as f:
        f.write(
            json.dumps(
                {
                    "remove": {
                        "path": a3["add"]["path"],
                        "dataChange": True,
                    }
                }
            )
            + "\n"
        )


def test_delta_log_replay_excludes_removed_files(spark, tmp_path):
    from duckdb_extension_clickhouse_native_spark.sources.delta_table import (
        delta_table,
    )

    root = str(tmp_path / "dt")
    _write_delta(root)
    df = delta_table(spark, root)
    ks = sorted(r.k for r in df.collect())
    assert ks == [1, 2, 3, 4]  # 99 was removed by the replay


def test_delta_time_travel(spark, tmp_path):
    from duckdb_extension_clickhouse_native_spark.sources.delta_table import (
        delta_table,
    )

    root = str(tmp_path / "dt")
    _write_delta(root)
    assert sorted(
        r.k for r in delta_table(spark, root, version=1).collect()
    ) == [1, 2, 3, 4, 99]
    assert sorted(
        r.k for r in delta_table(spark, root, version=0).collect()
    ) == [1, 2, 3, 4]


def test_delta_partition_columns_materialize(spark, tmp_path):
    from duckdb_extension_clickhouse_native_spark.sources.delta_table import (
        delta_table,
    )

    root = str(tmp_path / "dtp")
    _write_delta(root, partitioned=True)
    df = delta_table(spark, root)
    rows = {r.k: r.p for r in df.collect()}
    assert rows == {1: 0, 2: 0, 3: 1, 4: 1}
    # partition pruning shape: filter on p then collect
    assert sorted(
        r.k for r in df.where(df.p == 1).collect()
    ) == [3, 4]


def test_delta_refusals(spark, tmp_path):
    from duckdb_extension_clickhouse_native_spark.sources.delta_table import (
        load_snapshot,
    )

    root = str(tmp_path / "ndt")
    os.makedirs(root)
    with pytest.raises(ValueError, match="_delta_log"):
        load_snapshot(root)
    root2 = str(tmp_path / "dv")
    _write_delta(root2)
    with open(
        os.path.join(root2, "_delta_log", f"{3:020d}.json"), "w"
    ) as f:
        f.write(
            json.dumps(
                {
                    "add": {
                        "path": "part-9.parquet",
                        "partitionValues": {},
                        "deletionVector": {"storageType": "u"},
                    }
                }
            )
            + "\n"
        )
    with pytest.raises(ValueError, match="deletion vectors"):
        load_snapshot(root2)
    # but time travel to before the DV commit still works
    assert len(load_snapshot(root2, version=2).files) == 2


def test_delta_checkpoint_replay(spark, tmp_path):
    """_last_checkpoint + checkpoint parquet replaces the JSON prefix;
    only commits after it replay."""
    from duckdb_extension_clickhouse_native_spark.sources.delta_table import (
        delta_table,
    )

    root = str(tmp_path / "cp")
    _write_delta(root)
    log = os.path.join(root, "_delta_log")
    # build a checkpoint at version 2 reflecting the replayed state
    with open(os.path.join(log, f"{0:020d}.json")) as f:
        actions = [json.loads(ln) for ln in f if ln.strip()]
    meta = next(a["metaData"] for a in actions if "metaData" in a)
    proto = next(a["protocol"] for a in actions if "protocol" in a)
    adds = [a["add"] for a in actions if "add" in a]
    # parquet cannot write empty structs — real checkpoints carry
    # map<string,string> here; give the empty dicts a key
    meta["configuration"] = {"appendOnly": "false"}
    meta["format"]["options"] = {"codec": "snappy"}
    for a in adds:
        # real checkpoints type partitionValues as map<string,string>
        # (never an empty struct); from_pylist infers structs, so give
        # the empty dict a key the reader ignores (not a schema column)
        a["partitionValues"] = {"__not_a_column": ""}
    rows = (
        [{"metaData": meta, "protocol": None, "add": None}]
        + [{"metaData": None, "protocol": proto, "add": None}]
        + [{"metaData": None, "protocol": None, "add": a} for a in adds]
    )
    pq.write_table(
        pa.Table.from_pylist(rows),
        os.path.join(log, f"{2:020d}.checkpoint.parquet"),
    )
    with open(os.path.join(log, "_last_checkpoint"), "w") as f:
        f.write(json.dumps({"version": 2, "size": len(rows)}))
    # delete the JSON prefix the checkpoint replaces — replay must not
    # need it
    for v in (0, 1, 2):
        os.remove(os.path.join(log, f"{v:020d}.json"))
    df = delta_table(spark, root)
    assert sorted(r.k for r in df.collect()) == [1, 2, 3, 4]
