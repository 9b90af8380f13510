"""BACKUP/RESTORE (operators/backup.py): snapshot round-trip,
incremental base_backup storage, corruption detection, and the
refuse-to-overwrite guard."""

from __future__ import annotations

import os

import pytest

from duckdb_extension_clickhouse_native_spark.operators.backup import (
    backup_table,
    restore_table,
    verify_backup,
)


def _write_table(spark, path, n=300):
    df = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .limit(n)
        .coalesce(3)
    )
    df.write.format("clickhouse_native").mode("overwrite").save(path)


def _counts(spark, path):
    df = spark.read.format("clickhouse_native").load(path)
    return sorted(
        (r.event_type, r.n) for r in
        df.groupBy("event_type").count().withColumnRenamed("count", "n").collect()
    )


def test_backup_restore_roundtrip(spark, tmp_path):
    src = str(tmp_path / "t")
    _write_table(spark, src)
    before = _counts(spark, src)
    b = str(tmp_path / "b1")
    m = backup_table(src, b, checksum=True, now_fn=lambda: 1.0)
    assert m["stored_files"] == len(m["files"]) and m["stored_files"] > 0
    # mutate the source AFTER the backup
    _write_table(spark, src, n=50)
    dest = str(tmp_path / "restored")
    r = restore_table(b, dest)
    assert r["restored_files"] == len(m["files"])
    assert _counts(spark, dest) == before  # the snapshot, not the mutation


def test_incremental_stores_only_changed(spark, tmp_path):
    src = str(tmp_path / "t")
    _write_table(spark, src)
    b1 = str(tmp_path / "b1")
    m1 = backup_table(src, b1, checksum=True, now_fn=lambda: 1.0)
    # append one new part; existing parts are untouched
    extra = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .limit(10)
        .coalesce(1)
    )
    extra.write.format("clickhouse_native").mode("append").save(src)
    b2 = str(tmp_path / "b2")
    m2 = backup_table(
        src, b2, base_backup=b1, checksum=True, now_fn=lambda: 2.0
    )
    assert len(m2["files"]) > len(m1["files"])
    # only the new part (+ its stats and string-marks sidecars)
    # stores bytes; every pre-existing file is a base reference
    assert 0 < m2["stored_files"] <= 3
    dest = str(tmp_path / "restored")
    restore_table(b2, dest)
    got = spark.read.format("clickhouse_native").load(dest).count()
    assert got == 310


def test_corruption_detected(spark, tmp_path):
    src = str(tmp_path / "t")
    _write_table(spark, src)
    b = str(tmp_path / "b1")
    backup_table(src, b, checksum=True, now_fn=lambda: 1.0)
    assert verify_backup(b)["ok"]
    # hard links share inodes with the source — corrupt a stored file
    # via REPLACEMENT (what bit-rot scrub detection is for)
    data = os.path.join(b, "data")
    victim = next(
        os.path.join(r, f)
        for r, _d, fs in os.walk(data)
        for f in fs
        if f.endswith(".clickhouse")
    )
    os.unlink(victim)
    with open(victim, "wb") as f:
        f.write(b"garbage")
    v = verify_backup(b)
    assert not v["ok"] and v["bad"]
    with pytest.raises(ValueError, match="corrupt"):
        restore_table(b, str(tmp_path / "restored"))


def test_refuses_nonempty_destination(spark, tmp_path):
    src = str(tmp_path / "t")
    _write_table(spark, src)
    b = str(tmp_path / "b1")
    backup_table(src, b, now_fn=lambda: 1.0)
    dest = tmp_path / "restored"
    dest.mkdir()
    (dest / "existing").write_text("x")
    with pytest.raises(ValueError, match="not empty"):
        restore_table(b, str(dest))
    with pytest.raises(ValueError, match="already holds"):
        backup_table(src, b, now_fn=lambda: 2.0)
