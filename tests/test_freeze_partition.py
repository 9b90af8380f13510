"""FREEZE PARTITION: shadow/<N>/ hard-link snapshots. Pins: the live
read NEVER sees shadow files (resolve_paths descends only key=value
dirs — frozen data must not double rows), snapshots survive DROP
PARTITION, the increment counter advances, name collisions refuse,
missing partitions refuse, flat tables freeze whole.
"""

from __future__ import annotations

import os
import shutil

import pyarrow.parquet as pq
import pytest

from duckdb_extension_clickhouse_native_spark.operators.backup import (
    freeze_partition,
)

SRC = "/root/testdata/sf0.001/orders.parquet"


@pytest.fixture()
def hive_table(spark, tmp_path):
    d = str(tmp_path / "orders")
    (
        spark.read.parquet(SRC)
        .repartition(2)
        .write.format("clickhouse_native")
        .option("partition_by", "o_orderstatus")
        .mode("overwrite")
        .save(d)
    )
    return d


def test_freeze_does_not_pollute_live_reads(spark, hive_table):
    full = spark.read.format("clickhouse_native").load(hive_table).count()
    snap = freeze_partition(hive_table, "o_orderstatus=F")
    assert snap["n_files"] > 0
    # live read after freezing: same count — shadow/ is invisible
    again = spark.read.format("clickhouse_native").load(hive_table).count()
    assert again == full


def test_freeze_survives_drop_partition(spark, hive_table):
    want = (
        spark.read.format("clickhouse_native")
        .load(os.path.join(hive_table, "o_orderstatus=F"))
        .count()
    )
    snap = freeze_partition(hive_table, "o_orderstatus=F")
    shutil.rmtree(os.path.join(hive_table, "o_orderstatus=F"))
    frozen = (
        spark.read.format("clickhouse_native")
        .load(os.path.join(snap["shadow_dir"], "o_orderstatus=F"))
        .count()
    )
    assert frozen == want > 0


def test_freeze_lifecycle(spark, hive_table):
    s1 = freeze_partition(hive_table, "o_orderstatus=F")
    s2 = freeze_partition(hive_table, "o_orderstatus=O")
    assert s1["shadow_dir"].endswith("/1") and s2["shadow_dir"].endswith("/2")
    with pytest.raises(ValueError, match="already exists"):
        freeze_partition(
            hive_table, "o_orderstatus=F", shadow_name="1"
        )
    with pytest.raises(ValueError, match="no partition"):
        freeze_partition(hive_table, "o_orderstatus=ZZZ")


def test_freeze_flat_table(spark, tmp_path):
    from duckdb_extension_clickhouse_native_spark.native.writer import (
        write_native_file,
    )

    d = str(tmp_path / "flat")
    os.makedirs(d)
    write_native_file(os.path.join(d, "p.clickhouse"), pq.read_table(SRC))
    snap = freeze_partition(d, "")
    # data file + stats sidecar
    assert snap["n_files"] == 2
    n = (
        spark.read.format("clickhouse_native")
        .load(snap["shadow_dir"])
        .count()
    )
    assert n == pq.read_table(SRC).num_rows
    # freezing again must not re-link the shadow area into itself
    snap2 = freeze_partition(d, "")
    assert snap2["n_files"] == 2


def test_freeze_ignores_shadow_prefixed_siblings(spark, tmp_path):
    """A sibling directory merely NAMED like the shadow area (e.g.
    'shadow_old') is live data and must be frozen, not skipped — the
    exclusion is os.sep-anchored (ADVICE r12)."""
    from duckdb_extension_clickhouse_native_spark.native.writer import (
        write_native_file,
    )

    d = str(tmp_path / "flat2")
    os.makedirs(os.path.join(d, "shadow_old"))
    t = pq.read_table(SRC)
    write_native_file(os.path.join(d, "p.clickhouse"), t)
    write_native_file(os.path.join(d, "shadow_old", "q.clickhouse"), t)
    snap = freeze_partition(d, "")
    # both parts (+ their stats sidecars) linked, shadow_old included
    assert snap["n_files"] == 4
    assert os.path.exists(
        os.path.join(snap["shadow_dir"], "shadow_old", "q.clickhouse")
    )
