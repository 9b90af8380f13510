#!/usr/bin/env python
"""Block-range skipping probe: one LARGE sorted Native file, a
selective range predicate, scan time with the per-block sidecar index
(split_blocks + pruning) vs the whole-file scan. The claim: selective
scans over a sorted/clustered single file cost proportional to the
SELECTED block ranges, not the file — the property that makes one
z-ordered 100 GB file cheap to probe, complementing file-level
pruning (which needs many files).

Appends a section to SCALE_PIPELINE.md. Usage:
python tools/blockskip_scale_probe.py
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_ROWS = 8_000_000
N_BLOCKS = 64
SELECT_FRAC = 20  # predicate selects 1/20 of the key range


def build(base: str) -> str:
    import numpy as np
    import pyarrow as pa

    from duckdb_extension_clickhouse_native_spark.native.writer import (
        write_native_file,
    )

    d = os.path.join(base, f"blockskip-{N_ROWS}")
    marker = os.path.join(d, "_DONE")
    if os.path.exists(marker):
        return d
    os.makedirs(d, exist_ok=True)
    ks = np.arange(N_ROWS, dtype=np.int64)
    # a real row payload: string decode is the expensive path (int
    # columns are memcpy-fast, so an int-only probe measures overhead)
    payload = pa.array(
        ["v%016d-%016d" % (k, k * 2654435761 % 2**31) for k in ks]
    )
    t = pa.table({"k": pa.array(ks), "payload": payload})
    write_native_file(
        os.path.join(d, "sorted.clickhouse"), t, block_rows=N_ROWS // N_BLOCKS
    )
    open(marker, "w").close()
    return d


def main() -> None:
    from duckdb_extension_clickhouse_native_spark import get_spark
    from duckdb_extension_clickhouse_native_spark.sources.native_datasource import (
        infer_native_schema,
    )

    spark = get_spark(app_name="blockskip-probe", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    d = build(os.path.join(tempfile.gettempdir(), "chsql_blockskip_probe"))
    schema = infer_native_schema({"path": d})
    lo, hi = 0, N_ROWS // SELECT_FRAC

    def timed(use_blocks: bool) -> tuple:
        reader = spark.read.format("clickhouse_native").schema(schema)
        if use_blocks:
            reader = reader.option("split_blocks", "true").option(
                "target_partition_bytes", str(8 * 1024 * 1024)
            )
        df = reader.load(d).filter(f"k >= {lo} AND k < {hi}")
        best = None
        for _ in range(3):
            t0 = time.time()
            # touch the payload so the string column must decode
            n = df.selectExpr("count(payload) AS n").collect()[0]["n"]
            sec = time.time() - t0
            best = sec if best is None else min(best, sec)
        return best, n

    whole, n1 = timed(False)
    pruned, n2 = timed(True)
    assert n1 == n2 == hi - lo, (n1, n2)
    print(
        f"  whole-file: {whole:.2f}s   block-pruned: {pruned:.2f}s "
        f"({whole / pruned:.1f}x)",
        file=sys.stderr,
    )
    lines = [
        "",
        "## Block-range skipping (per-block sidecar index, single large file)",
        "",
        f"One sorted {N_ROWS:,}-row / {N_BLOCKS}-block Native file "
        "(int64 key + 35-char string payload), predicate "
        f"selecting 1/{SELECT_FRAC} of the key range, local[32], best of 3.",
        "",
        "| scan | seconds | rows |",
        "|---|---|---|",
        f"| whole file (no split) | {whole:.2f} | {n1} |",
        f"| block-range pruned | {pruned:.2f} | {n2} |",
        "",
        f"{whole / pruned:.1f}x from reading only the selected block ranges — "
        "selective scans over clustered single files cost proportional to "
        "the selection, the in-file complement of directory/file pruning.",
    ]
    with open(os.path.join(REPO, "SCALE_PIPELINE.md"), "a") as f:
        f.write("\n".join(lines) + "\n")
    print("appended block-skipping section to SCALE_PIPELINE.md")
    spark.stop()


if __name__ == "__main__":
    main()
