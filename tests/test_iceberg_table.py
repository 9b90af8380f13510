"""iceberg() table function (r15, sources/iceberg_table.py): metadata
JSON -> manifest-list Avro -> manifest Avro -> parquet replay, built
entirely from the public Iceberg spec with the engine's own Avro
writer producing the manifests."""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from duckdb_extension_clickhouse_native_spark.native.avroformat import (
    named_tuple_type,
    write_avro,
)
from duckdb_extension_clickhouse_native_spark.native.types import parse_type

_DF_TUPLE = named_tuple_type(
    [
        ("content", "Int32"),
        ("file_path", "String"),
        ("file_format", "String"),
        ("record_count", "Int64"),
        ("file_size_in_bytes", "Int64"),
    ]
)


def _write_manifest(path: str, entries: list) -> None:
    """entries: [(status, file_path, content)]"""
    batch = pa.record_batch(
        {
            "status": pa.array([e[0] for e in entries], pa.int32()),
            "snapshot_id": pa.array(
                [1] * len(entries), pa.int64()
            ),
            "data_file": pa.array(
                [
                    {
                        "content": e[2],
                        "file_path": e[1],
                        "file_format": "PARQUET",
                        "record_count": 1,
                        "file_size_in_bytes": 1,
                    }
                    for e in entries
                ],
                pa.struct(
                    [
                        pa.field("content", pa.int32()),
                        pa.field("file_path", pa.string()),
                        pa.field("file_format", pa.string()),
                        pa.field("record_count", pa.int64()),
                        pa.field("file_size_in_bytes", pa.int64()),
                    ]
                ),
            ),
        }
    )
    with open(path, "wb") as f:
        write_avro(
            f,
            [batch],
            ch_types=[
                parse_type("Int32"),
                parse_type("Nullable(Int64)"),
                _DF_TUPLE,
            ],
        )


def _write_manifest_list(path: str, manifests: list, content=0) -> None:
    batch = pa.record_batch(
        {
            "manifest_path": pa.array(manifests, pa.string()),
            "manifest_length": pa.array([1] * len(manifests), pa.int64()),
            "partition_spec_id": pa.array([0] * len(manifests), pa.int32()),
            "content": pa.array([content] * len(manifests), pa.int32()),
        }
    )
    with open(path, "wb") as f:
        write_avro(
            f,
            [batch],
            ch_types=[
                parse_type("String"),
                parse_type("Int64"),
                parse_type("Int32"),
                parse_type("Int32"),
            ],
        )


def build_iceberg_table(root: str) -> None:
    """3 data files; snapshot 1 sees all three, snapshot 2 (current)
    DELETES the third via manifest status=2 — the replay semantics."""
    data = os.path.join(root, "data")
    mdir = os.path.join(root, "metadata")
    os.makedirs(data)
    os.makedirs(mdir)
    for i, ks in enumerate([[1, 2], [3, 4], [99]]):
        pq.write_table(
            pa.table(
                {
                    "k": pa.array(ks, pa.int64()),
                    "v": pa.array([f"v{k}" for k in ks]),
                }
            ),
            os.path.join(data, f"part-{i}.parquet"),
        )
    _write_manifest(
        os.path.join(mdir, "m1.avro"),
        [
            (1, os.path.join(data, "part-0.parquet"), 0),
            (1, os.path.join(data, "part-1.parquet"), 0),
            (1, os.path.join(data, "part-2.parquet"), 0),
        ],
    )
    _write_manifest(
        os.path.join(mdir, "m2.avro"),
        [
            (0, os.path.join(data, "part-0.parquet"), 0),
            (0, os.path.join(data, "part-1.parquet"), 0),
            (2, os.path.join(data, "part-2.parquet"), 0),  # DELETED
        ],
    )
    _write_manifest_list(
        os.path.join(mdir, "ml1.avro"), [os.path.join(mdir, "m1.avro")]
    )
    _write_manifest_list(
        os.path.join(mdir, "ml2.avro"), [os.path.join(mdir, "m2.avro")]
    )
    meta = {
        "format-version": 2,
        "table-uuid": "00000000-0000-0000-0000-000000000000",
        "location": root,
        "current-snapshot-id": 2,
        "schemas": [
            {
                "schema-id": 0,
                "type": "struct",
                "fields": [
                    {"id": 1, "name": "k", "type": "long",
                     "required": False},
                    {"id": 2, "name": "v", "type": "string",
                     "required": False},
                ],
            }
        ],
        "current-schema-id": 0,
        "snapshots": [
            {
                "snapshot-id": 1,
                "manifest-list": os.path.join(mdir, "ml1.avro"),
            },
            {
                "snapshot-id": 2,
                "manifest-list": os.path.join(mdir, "ml2.avro"),
            },
        ],
    }
    with open(os.path.join(mdir, "v3.metadata.json"), "w") as f:
        json.dump(meta, f)
    with open(os.path.join(mdir, "version-hint.text"), "w") as f:
        f.write("3")


def test_iceberg_current_snapshot_excludes_deleted(spark, tmp_path):
    from duckdb_extension_clickhouse_native_spark.sources.iceberg_table import (
        iceberg_table,
    )

    root = str(tmp_path / "it")
    build_iceberg_table(root)
    df = iceberg_table(spark, root)
    assert sorted(r.k for r in df.collect()) == [1, 2, 3, 4]
    assert df.columns == ["k", "v"]


def test_iceberg_time_travel_by_snapshot_id(spark, tmp_path):
    from duckdb_extension_clickhouse_native_spark.sources.iceberg_table import (
        iceberg_table,
    )

    root = str(tmp_path / "it")
    build_iceberg_table(root)
    assert sorted(
        r.k for r in iceberg_table(spark, root, snapshot_id=1).collect()
    ) == [1, 2, 3, 4, 99]
    with pytest.raises(Exception, match="snapshot 77 not found"):
        iceberg_table(spark, root, snapshot_id=77).collect()


def test_iceberg_refusals(spark, tmp_path):
    from duckdb_extension_clickhouse_native_spark.sources.iceberg_table import (
        load_iceberg_snapshot,
    )

    root = str(tmp_path / "nope")
    os.makedirs(root)
    with pytest.raises(ValueError, match="metadata directory"):
        load_iceberg_snapshot(root)
    # delete manifests refuse by name
    root2 = str(tmp_path / "dv")
    build_iceberg_table(root2)
    mdir = os.path.join(root2, "metadata")
    _write_manifest_list(
        os.path.join(mdir, "ml2.avro"),
        [os.path.join(mdir, "m2.avro")],
        content=1,
    )
    with pytest.raises(ValueError, match="DELETE manifests"):
        load_iceberg_snapshot(root2)


def test_iceberg_path_rerooting(spark, tmp_path):
    """A table copied from another filesystem keeps its writer-side
    absolute URIs; the reader re-roots them under the local path."""
    import shutil

    from duckdb_extension_clickhouse_native_spark.sources.iceberg_table import (
        iceberg_table,
    )

    orig = str(tmp_path / "orig" / "tbl")
    os.makedirs(os.path.dirname(orig))
    build_iceberg_table(orig)
    moved = str(tmp_path / "moved" / "tbl")
    os.makedirs(os.path.dirname(moved))
    shutil.move(orig, moved)
    df = iceberg_table(spark, moved)
    assert sorted(r.k for r in df.collect()) == [1, 2, 3, 4]
