#!/usr/bin/env python
"""Wire-format decode/encode throughput probe: one 1M-row scalar table
through every codec pair, wall-timed — the measured basis for "Native
is the fast path; RowBinary the binary interop path; JSON/TSV/CSV the
text interop paths" (SCALE.md).

Run: python tools/wire_probe.py  [n_rows]
"""

from __future__ import annotations

import io
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402
import pyarrow as pa  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    rng = np.random.default_rng(7)
    batch = pa.RecordBatch.from_arrays(
        [
            pa.array(rng.integers(-(2**31), 2**31, n), type=pa.int64()),
            pa.array(rng.random(n), type=pa.float64()),
            pa.array([f"row{i % 99999}" for i in range(n)]),
        ],
        names=["i", "f", "s"],
    )

    from duckdb_extension_clickhouse_native_spark.native.codec import iter_blocks
    from duckdb_extension_clickhouse_native_spark.native.jsoneachrow import (
        iter_jsoncompact_blocks,
        write_jsoncompact,
    )
    from duckdb_extension_clickhouse_native_spark.native.rowbinary import (
        iter_rowbinary_blocks,
        write_rowbinary,
    )
    from duckdb_extension_clickhouse_native_spark.native.textformats import (
        iter_csv_blocks,
        iter_tsv_blocks,
        write_csv,
        write_tsv,
    )
    from duckdb_extension_clickhouse_native_spark.native.writer import (
        arrow_to_native_bytes,
    )

    def native_write(buf, batches):
        buf.write(arrow_to_native_bytes(pa.Table.from_batches(list(batches))))

    fmts = [
        ("Native", native_write, iter_blocks),
        ("RowBinary", write_rowbinary, iter_rowbinary_blocks),
        ("JSONCompactEachRow", write_jsoncompact, iter_jsoncompact_blocks),
        ("TSV", write_tsv, iter_tsv_blocks),
        ("CSV", write_csv, iter_csv_blocks),
    ]
    rows = []
    for name, writer, reader in fmts:
        buf = io.BytesIO()
        t0 = time.perf_counter()
        writer(buf, [batch])
        enc = time.perf_counter() - t0
        size = buf.tell()
        buf.seek(0)
        t0 = time.perf_counter()
        got = sum(b.n_rows for b in reader(buf))
        dec = time.perf_counter() - t0
        assert got == n
        rows.append((name, size / 1e6, enc, n / enc / 1e6, dec, n / dec / 1e6))
        print(
            f"  {name}: {size/1e6:.1f} MB, encode {enc:.2f}s "
            f"({n/enc/1e6:.2f} M rows/s), decode {dec:.2f}s "
            f"({n/dec/1e6:.2f} M rows/s)",
            file=sys.stderr,
        )

    lines = [
        "",
        "## Wire-format codec throughput (round 9)",
        "",
        f"One {n:,}-row (Int64, Float64, String) table through each "
        "codec pair, single-threaded driver-side (per-partition "
        "decode parallelism comes on top in the DataSource):",
        "",
        "| format | bytes (MB) | encode s | enc M rows/s | decode s | dec M rows/s |",
        "|---|---|---|---|---|---|",
    ]
    for name, mb, enc, encr, dec, decr in rows:
        lines.append(
            f"| {name} | {mb:.1f} | {enc:.2f} | {encr:.2f} | {dec:.2f} | {decr:.2f} |"
        )
    base = rows[0][4]
    lines.append("")
    lines.append(
        "Native's columnar numpy decode is the fast path "
        f"({rows[0][5]:.1f} M rows/s here); RowBinary's structured-dtype "
        "fast path applies only to all-fixed-width schemas (this one has "
        "a String column, so it runs the sequential row loop); the text "
        "formats pay per-value parsing and exist for interop, not "
        f"throughput ({rows[0][4]:.2f}s vs {rows[-1][4]:.2f}s decode)."
    )
    with open(os.path.join(REPO, "SCALE.md"), "a") as f:
        f.write("\n".join(lines) + "\n")
    print("appended to SCALE.md", file=sys.stderr)
    _ = base


if __name__ == "__main__":
    main()
