#!/usr/bin/env python
"""Measure the bloom / ngrambf skip-index win at scan scale: a 10M-row
/ 64-part fixture whose high-cardinality ``uid`` strings are
hash-SCATTERED across parts (every part's min/max spans the whole key
space — the layout a 100 TB table has when partitioned by some OTHER
key), probed with equality and substring predicates.

Prints planned partitions + wall time with the index consulted vs the
same files with their index entries stripped (min/max only).

Run: python tools/bloom_scale_probe.py
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


def build_fixture(base: str) -> str:
    import numpy as np
    import pyarrow as pa

    from duckdb_extension_clickhouse_native_spark.native.writer import (
        write_native_file,
    )

    d = os.path.join(base, f"bloom-{N_ROWS}-{N_PARTS}")
    if os.path.exists(os.path.join(d, "_DONE")):
        return d
    os.makedirs(d, exist_ok=True)
    ids = np.arange(N_ROWS, dtype=np.int64)
    # cheap deterministic scatter: multiplicative hash on the id
    bucket = (ids * 2654435761) % N_PARTS
    uid = np.char.add("u", ids.astype(str))
    for b in range(N_PARTS):
        mask = bucket == b
        t = pa.table(
            {
                "uid": pa.array(uid[mask]),
                "v": pa.array(ids[mask] % 1000),
            }
        )
        write_native_file(
            os.path.join(d, f"part-{b:03d}.clickhouse"),
            t,
            block_rows=65_409,
            index_bloom=["uid"],
        )
    open(os.path.join(d, "_DONE"), "w").close()
    return d


def strip_index(src: str, base: str) -> str:
    """Same data files (hard links), sidecars rewritten without the
    bloom entries — the min/max-only control."""
    d = os.path.join(base, f"bloom-stripped-{N_ROWS}-{N_PARTS}")
    if os.path.exists(os.path.join(d, "_DONE")):
        return d
    os.makedirs(d, exist_ok=True)
    for f in sorted(os.listdir(src)):
        s, t = os.path.join(src, f), os.path.join(d, f)
        if f.endswith(".clickhouse"):
            if not os.path.exists(t):
                os.link(s, t)
        elif f.endswith(".stats.json"):
            side = json.load(open(s))
            side.pop("bloom", None)
            side.pop("ngrambf", None)
            json.dump(side, open(t, "w"))
    open(os.path.join(d, "_DONE"), "w").close()
    return d


def main() -> None:
    from duckdb_extension_clickhouse_native_spark import get_spark

    spark = get_spark(app_name="bloom-probe", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    base = os.path.join(tempfile.gettempdir(), "chsql_scale_probe")
    os.makedirs(base, exist_ok=True)
    indexed = build_fixture(base)
    control = strip_index(indexed, base)

    probe = "uid = 'u4242424'"
    for label, d in [("bloom index", indexed), ("min/max only", control)]:
        df = spark.read.format("clickhouse_native").load(d).filter(probe)
        df.count()  # warm
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            n = df.count()
            ts.append(time.perf_counter() - t0)
        ts.sort()
        parts = df.rdd.getNumPartitions()
        print(
            f"{label:14s} point probe: {parts:>2}/{N_PARTS} partitions "
            f"planned, {n} row, median {ts[len(ts)//2]:.3f}s "
            f"(min {ts[0]:.3f})"
        )

    spark.stop()


if __name__ == "__main__":
    main()
