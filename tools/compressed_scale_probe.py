#!/usr/bin/env python
"""Measure the r15 compressed file()/url()/s3() read path at scan
scale: whole-stream gzip/zstd decompression in front of the shared
wire decoders, one (unsplittable) compressed file = one partition.

Questions this answers for the 100 TB design:
  * what does transport decompression COST vs the plain read of the
    same bytes (same decoder, same partitioning)?
  * does file-count parallelism amortize it the way the plain path's
    does (it must — the decompressor runs inside the per-partition
    task, so 16 files = 16 concurrent decompress streams)?

Run: python tools/compressed_scale_probe.py
(appends a dated section to SCALE.md with --write)
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_ROWS = 8_000_000
N_FILES = 16
RUNS = 5


def build_fixtures(base: str) -> dict:
    """{series: dir} — the SAME rows as Native plain / Native+zstd /
    Native+gzip shards (identical decoder work; only the transport
    wrapper differs)."""
    import numpy as np
    import pyarrow as pa

    from duckdb_extension_clickhouse_native_spark.native.contentcodec import (
        compress_bytes,
    )
    from duckdb_extension_clickhouse_native_spark.native.writer import (
        write_native_file,
    )

    out = {}
    plain = os.path.join(base, f"cmp-plain-{N_ROWS}-{N_FILES}")
    out["native_plain"] = plain
    gz = os.path.join(base, f"cmp-gz-{N_ROWS}-{N_FILES}")
    out["native_gzip"] = gz
    zst = os.path.join(base, f"cmp-zst-{N_ROWS}-{N_FILES}")
    out["native_zstd"] = zst
    if all(os.path.exists(os.path.join(d, "_DONE")) for d in out.values()):
        return out
    for d in out.values():
        os.makedirs(d, exist_ok=True)
    per = -(-N_ROWS // N_FILES)
    for i in range(N_FILES):
        start, end = i * per, min((i + 1) * per, N_ROWS)
        t = pa.table(
            {"number": pa.array(np.arange(start, end, dtype=np.int64))}
        )
        p = os.path.join(plain, f"part-{i:03d}.native")
        write_native_file(p, t, block_rows=65_409)
        raw = open(p, "rb").read()
        with open(os.path.join(gz, f"part-{i:03d}.native.gz"), "wb") as f:
            f.write(compress_bytes(raw, "gzip"))
        with open(os.path.join(zst, f"part-{i:03d}.native.zst"), "wb") as f:
            f.write(compress_bytes(raw, "zstd"))
    for d in out.values():
        open(os.path.join(d, "_DONE"), "w").close()
    return out


def main() -> None:
    from duckdb_extension_clickhouse_native_spark import get_spark
    from duckdb_extension_clickhouse_native_spark.sources.file_table import (
        file_table,
    )

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="chsql-compressed-probe", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    base = os.path.join(tempfile.gettempdir(), "chsql_cmp_probe")
    os.makedirs(base, exist_ok=True)
    dirs = build_fixtures(base)

    lines = []
    for series, d in dirs.items():
        ext = {"native_plain": "", "native_gzip": ".gz",
               "native_zstd": ".zst"}[series]
        size = sum(
            os.path.getsize(os.path.join(d, f))
            for f in os.listdir(d)
            if f.startswith("part")
        )
        df = file_table(spark, os.path.join(d, f"part*.native{ext}"),
                        "Native")
        assert df.rdd.getNumPartitions() == N_FILES
        n = df.count()  # untimed warmup
        assert n == N_ROWS
        ts = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            df.count()
            ts.append(time.perf_counter() - t0)
        ts.sort()
        med = ts[len(ts) // 2]
        lines.append(
            f"| {series} | {size / 1e6:.1f} MB | {med:.3f} s | "
            f"{N_ROWS / med / 1e6:.1f} M rows/s | "
            f"{size / med / 1e6:.0f} MB/s |"
        )
        print(f"# {series}: {lines[-1]}", file=sys.stderr)

    header = (
        f"\n## Compressed file() scan ({N_ROWS / 1e6:.0f}M rows x "
        f"{N_FILES} files, local[{cpus}], median of {RUNS}) — r15\n\n"
        "Same Native rows, three transports; one compressed file = one\n"
        "partition (unsplittable), decompression runs inside each\n"
        "partition task so file-count parallelism amortizes it.\n\n"
        "| series | bytes on disk | count() | throughput | decompress rate |\n"
        "|---|---|---|---|---|\n"
    )
    block = header + "\n".join(lines) + "\n"
    print(block)
    if "--write" in sys.argv:
        with open(os.path.join(REPO, "SCALE.md"), "a") as f:
            f.write(block)
        print("# appended to SCALE.md", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
