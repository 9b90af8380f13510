#!/usr/bin/env python
"""Round-start health check. Run FIRST thing every round:

    python tools/roundcheck.py

Catches the failure modes that silently ate rounds 3-4:
* the driver regenerates /root/testdata each round and STORAGE TYPES
  DRIFT (events.ts: int64-ns in r1-r2 -> timestamp[us] in r3+), which
  can crash queries that graded green the round before;
* BENCH_r{N}.json records rc=1 with a stack trace instead of numbers
  when bench.py crashes — a red flag the scoreboard does not surface;
* CORRECTNESS_r{N}.json identical to the previous round means the
  prior session did no work.

Exit 0 = all clear; nonzero = print what changed and fix before
building features.
"""
from __future__ import annotations

import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# last-known storage types; update when accepting a new drift
EXPECTED = {
    "events": {
        "event_id": "int64",
        "ts": ("timestamp[us]", "int64"),  # both seen across rounds
        "user_id": "int64",
        "event_type": "string",
        "value": "double",
        "props": "string",
    },
    "embeddings": {
        "vec_id": "int64",
        "embedding": "list<element: float>",
        "label": "int32",
    },
}


def check_schemas() -> list[str]:
    import pyarrow.parquet as pq

    problems = []
    sf = "/root/testdata/sf0.01"
    for table, cols in EXPECTED.items():
        path = f"{sf}/{table}.parquet"
        if not os.path.exists(path):
            problems.append(f"{path} missing")
            continue
        schema = pq.read_schema(path)
        got = {f.name: str(f.type) for f in schema}
        for name, want in cols.items():
            wants = want if isinstance(want, tuple) else (want,)
            if got.get(name) not in wants:
                problems.append(
                    f"{table}.{name}: stored as {got.get(name)!r}, expected one "
                    f"of {wants} — check every expression touching it "
                    "(see memory: driver-grading-traps)"
                )
    return problems


def check_bench() -> list[str]:
    problems = []
    benches = sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json")))
    if benches:
        last = benches[-1]
        d = json.load(open(last))
        if d.get("rc", 0) != 0:
            problems.append(
                f"{os.path.basename(last)} has rc={d['rc']} — the bench "
                f"CRASHED last round; tail: {str(d.get('tail'))[-300:]}"
            )
    return problems


def check_correctness() -> list[str]:
    problems = []
    files = sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")))
    if len(files) >= 2:
        a, b = json.load(open(files[-2])), json.load(open(files[-1]))
        if a == b:
            problems.append(
                f"{os.path.basename(files[-2])} == {os.path.basename(files[-1])}"
                " — the previous round made no grading progress (stalled?)"
            )
        red = [k for k, v in b.items() if not (v.get("hash_match") and v.get("rows_match"))]
        if red:
            problems.append(
                f"{os.path.basename(files[-1])} red rows (fix first): {red}"
            )
    return problems


def main() -> int:
    problems = check_schemas() + check_bench() + check_correctness()
    for p in problems:
        print("!!", p)
    print(("NOT CLEAN — address the above first" if problems else "all clear"))
    return 1 if problems else 0


if __name__ == "__main__":
    raise SystemExit(main())
