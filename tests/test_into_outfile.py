"""INTO OUTFILE: single-file executor-side export over every wire
format. Contract pins: refuse-to-overwrite without truncate, .gz
extension sniffing, lossless roundtrip through each self-describing
format's own decoder, npy single-column rule, unknown-format refusal.
"""

from __future__ import annotations

import gzip
import io
import os

import pytest

from duckdb_extension_clickhouse_native_spark.operators.outfile import (
    into_outfile,
)

SRC = "/root/testdata/sf0.001/nation.parquet"


@pytest.fixture(scope="module")
def nation(spark):
    return spark.read.parquet(SRC).select(
        "n_nationkey", "n_name", "n_regionkey"
    )


def _decode(fmt, raw):
    buf = io.BytesIO(raw)
    if fmt == "native":
        from duckdb_extension_clickhouse_native_spark.native.codec import (
            iter_blocks,
        )

        blocks = iter_blocks(buf)
    elif fmt == "rowbinary":
        from duckdb_extension_clickhouse_native_spark.native.rowbinary import (
            iter_rowbinary_blocks,
        )

        blocks = iter_rowbinary_blocks(buf)
    elif fmt == "tsv":
        from duckdb_extension_clickhouse_native_spark.native.textformats import (
            iter_tsv_blocks,
        )

        blocks = iter_tsv_blocks(buf)
    elif fmt == "csv":
        from duckdb_extension_clickhouse_native_spark.native.textformats import (
            iter_csv_blocks,
        )

        blocks = iter_csv_blocks(buf)
    elif fmt == "arrowstream":
        from duckdb_extension_clickhouse_native_spark.native.arrowwire import (
            iter_arrow_blocks,
        )

        blocks = iter_arrow_blocks(buf)
    elif fmt == "parquet":
        from duckdb_extension_clickhouse_native_spark.native.arrowwire import (
            iter_parquet_blocks,
        )

        blocks = iter_parquet_blocks(buf)
    elif fmt == "orc":
        from duckdb_extension_clickhouse_native_spark.native.arrowwire import (
            iter_orc_blocks,
        )

        blocks = iter_orc_blocks(buf)
    else:
        raise AssertionError(fmt)
    rows = []
    for b in blocks:
        rb = b.to_record_batch()
        rows.extend(zip(*(rb.column(i).to_pylist() for i in range(rb.num_columns))))
    return rows


@pytest.mark.parametrize(
    "fmt",
    ["native", "rowbinary", "tsv", "csv", "arrowstream", "parquet", "orc"],
)
def test_outfile_roundtrip_each_format(spark, nation, tmp_path, fmt):
    p = str(tmp_path / f"nation.{fmt}")
    n = into_outfile(nation, p, fmt)
    assert n == 25 and os.path.exists(p)
    rows = sorted(_decode(fmt, open(p, "rb").read()))
    want = sorted(
        (r["n_nationkey"], r["n_name"], r["n_regionkey"])
        for r in nation.collect()
    )
    assert rows == want


def test_outfile_gzip_and_truncate(spark, nation, tmp_path):
    p = str(tmp_path / "nation.csv.gz")
    n = into_outfile(nation, p, "csv")
    assert n == 25
    rows = sorted(_decode("csv", gzip.open(p, "rb").read()))
    assert len(rows) == 25
    with pytest.raises(FileExistsError, match="TRUNCATE"):
        into_outfile(nation, p, "csv")
    assert into_outfile(nation.limit(5), p, "csv", truncate=True) == 5
    assert len(_decode("csv", gzip.open(p, "rb").read())) == 5


def test_outfile_npy_and_refusals(spark, nation, tmp_path):
    p = str(tmp_path / "keys.npy")
    n = into_outfile(nation.select("n_nationkey"), p, "npy")
    assert n == 25
    import numpy as np

    got = np.load(p, allow_pickle=False)
    assert sorted(got.tolist()) == list(range(25))
    with pytest.raises(Exception, match="one column"):
        into_outfile(nation, str(tmp_path / "bad.npy"), "npy")
    with pytest.raises(ValueError, match="format must be one of"):
        into_outfile(nation, str(tmp_path / "x"), "xml")


def test_outfile_failure_preserves_previous_file(spark, nation, tmp_path):
    """A failed export must leave the previous file intact (the old
    pre-delete destroyed both versions — review finding)."""
    p = str(tmp_path / "keep.npy")
    assert into_outfile(nation.select("n_nationkey"), p, "npy") == 25
    before = open(p, "rb").read()
    # multi-column npy export fails executor-side
    with pytest.raises(Exception, match="one column"):
        into_outfile(nation, p, "npy", truncate=True)
    assert open(p, "rb").read() == before


def test_outfile_empty_result_is_valid_file(spark, nation, tmp_path):
    """INTO OUTFILE of an empty SELECT writes a VALID file with the
    schema (a 0-byte ORC/Parquet body is unreadable — review finding)."""
    empty = nation.filter("n_nationkey < 0")
    for fmt in ("orc", "parquet", "csv", "native"):
        p = str(tmp_path / f"empty.{fmt}")
        assert into_outfile(empty, p, fmt) == 0
        assert os.path.getsize(p) > 0 or fmt == "native"
        if fmt in ("orc", "parquet"):
            rows = _decode(fmt, open(p, "rb").read())
            assert rows == []


def test_bare_writers_refuse_zero_batches():
    from duckdb_extension_clickhouse_native_spark.native.arrowwire import (
        write_orc,
        write_parquet,
    )

    for w in (write_orc, write_parquet):
        with pytest.raises(ValueError, match="zero batches"):
            w(io.BytesIO(), [])
