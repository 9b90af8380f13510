#!/usr/bin/env python
"""Measure the tokenbf skip-index win at scan scale: a 10M-row /
64-part fixture whose ``text`` column shares one vocabulary across
every part (min/max, value-bloom and even substring-ngram statistics
are all blind to a common-word probe), with a part-specific
``tag_<b>`` token embedded in each part's rows — the layout of a
corpus where a rare token (an error code, a document family, a
domain) clusters in a few parts.

Prints planned partitions + wall time for a token contains-probe with
the index consulted vs the same files with their tokenbf entries
stripped.

Run: python tools/tokenbf_scale_probe.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_ROWS = 10_000_000
N_PARTS = 64

_VOCAB = (
    "key agg row scan slow fast table value part hash batch window "
    "spark order data column join small line customer query filter"
).split()


def build_fixture(base: str) -> str:
    import numpy as np
    import pyarrow as pa

    from duckdb_extension_clickhouse_native_spark.native.writer import (
        write_native_file,
    )

    d = os.path.join(base, f"tokenbf-{N_ROWS}-{N_PARTS}")
    if os.path.exists(os.path.join(d, "_DONE")):
        return d
    os.makedirs(d, exist_ok=True)
    rows_per = N_ROWS // N_PARTS
    rng = np.random.default_rng(7)
    v = np.array(_VOCAB)
    for b in range(N_PARTS):
        words = v[rng.integers(0, len(v), size=(rows_per, 5))]
        text = np.array(
            [" ".join(w) for w in words], dtype=object
        )
        # the rare token: every row of part b carries tag_<b>
        text = np.char.add(text.astype(str), f" tag_{b} end")
        t = pa.table(
            {
                "id": pa.array(
                    np.arange(b * rows_per, (b + 1) * rows_per),
                    type=pa.int64(),
                ),
                "text": pa.array(text.tolist()),
            }
        )
        write_native_file(
            os.path.join(d, f"part-{b:03d}.clickhouse"),
            t,
            block_rows=65_409,
            index_tokenbf=["text"],
        )
    open(os.path.join(d, "_DONE"), "w").close()
    return d


def strip_index(src: str, base: str) -> str:
    """Same files, sidecars minus their tokenbf entries."""
    d = os.path.join(base, "tokenbf-stripped")
    if os.path.exists(os.path.join(d, "_DONE")):
        return d
    os.makedirs(d, exist_ok=True)
    for f in os.listdir(src):
        if f == "_DONE":
            continue
        s = os.path.join(src, f)
        t = os.path.join(d, f)
        if f.endswith(".stats.json"):
            side = json.load(open(s))
            side.pop("tokenbf", None)
            json.dump(side, open(t, "w"))
        else:
            os.link(s, t)
    open(os.path.join(d, "_DONE"), "w").close()
    return d


def probe(spark, path: str, needle: str):
    from duckdb_extension_clickhouse_native_spark.sources.native_datasource import (
        infer_native_schema,
    )

    from pyspark.sql import functions as F

    df = (
        spark.read.format("clickhouse_native")
        .schema(infer_native_schema({"path": path}))
        .load(path)
        # .contains() reaches the Python-DS pushFilters hook as
        # StringContains; a SQL LIKE '%x%' does not get translated
        .filter(F.col("text").contains(needle))
    )
    parts = df.rdd.getNumPartitions()
    t0 = time.time()
    n = df.count()
    return parts, n, time.time() - t0


def main() -> int:
    from duckdb_extension_clickhouse_native_spark import get_spark

    base = os.path.join(tempfile.gettempdir(), "chsql_scale_probes")
    os.makedirs(base, exist_ok=True)
    print(f"building {N_ROWS} rows x {N_PARTS} parts ...", flush=True)
    t0 = time.time()
    indexed = build_fixture(base)
    print(f"  fixture ready in {time.time()-t0:.1f}s")
    stripped = strip_index(indexed, base)

    spark = get_spark(app_name="tokenbf-probe", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    needle = " tag_37 "
    probe(spark, stripped, needle)  # untimed warmup: python workers, JIT
    for label, path in (("tokenbf", indexed), ("stripped", stripped)):
        best = None
        for _ in range(3):
            parts, n, dt = probe(spark, path, needle)
            best = dt if best is None else min(best, dt)
        print(
            f"{label:>9}: planned {parts:3d}/{N_PARTS} partitions, "
            f"{n} rows, best {best:.2f}s"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
