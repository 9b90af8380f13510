#!/usr/bin/env python
"""Recommend the next GRADING_WINDOW (the rotation discipline,
codified): never-driver-graded queries first, then the cohort whose
newest green evidence is oldest, newest-first within neither. Prints
the 50 names plus the evidence histogram so the round-opening session
can pin the window with data instead of archaeology.

Changed-path priority still needs human judgment (git knows what
changed; only the author knows which registered queries execute
through it) — the output marks where those should be inserted.

Run: python tools/window_plan.py
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    import __spark_entry__  # noqa: F401
    from duckdb_extension_clickhouse_native_spark.plans.base import REGISTRY

    latest_green: dict[str, int] = {}
    graded_ever: set = set()
    registered = set(REGISTRY.all())
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"_r(\d+)", f).group(1))
        rows = json.load(open(f))
        for name, row in rows.items():
            # names graded in an old round but since unregistered
            # (e.g. kmeans_fast / sim_topk_pq_fast, folded into their
            # parents in r6) must not pollute freshness accounting
            if name not in registered:
                continue
            graded_ever.add(name)
            ok = (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
                and not row.get("err")
            )
            if ok:
                latest_green[name] = max(latest_green.get(name, 0), rnd)

    names = list(REGISTRY.all())
    never = [n for n in names if n not in graded_ever]
    graded = sorted(
        (n for n in names if n in graded_ever),
        key=lambda n: (latest_green.get(n, 0), n),
    )
    red_ever = [n for n in graded if n not in latest_green]

    hist: dict[int, int] = {}
    for n in names:
        hist[latest_green.get(n, 0)] = hist.get(latest_green.get(n, 0), 0) + 1
    print(f"registry: {len(names)} queries; never graded: {len(never)}; "
          f"graded-never-green: {len(red_ever)}")
    print("latest-green histogram (0 = never):",
          {k: hist[k] for k in sorted(hist)})
    # evidence-freshness policy: no graded row's newest green should be
    # more than 3 rounds old (VERDICT r7 item 7) — surfacing the debt
    # here at round open beats discovering it in the judge's histogram
    latest_round = max(
        (int(re.search(r"_r(\d+)", f).group(1))
         for f in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))),
        default=0,
    )
    stale = sorted(
        (n for n, r in latest_green.items() if latest_round - r > 3),
        key=lambda n: latest_green[n],
    )
    if stale:
        print(f"WARNING: {len(stale)} rows have no green newer than "
              f"r{latest_round - 3} (policy: newest green within 3 rounds):")
        for n in stale:
            print(f"  stale: {n} (newest green r{latest_green[n]})")
    else:
        print(f"freshness: OK — every graded row green within the last 3 "
              f"rounds (<= r{latest_round})")
    print()
    window = (red_ever + never)[:50]
    window += [n for n in graded if n in latest_green][: 50 - len(window)]
    print("# recommended window (insert changed-path re-proofs after the")
    print("# never-graded block, displacing the oldest-evidence tail):")
    for n in window:
        tag = (
            "NEVER GRADED"
            if n in never
            else ("GRADED, NEVER GREEN" if n in red_ever else f"green r{latest_green[n]}")
        )
        print(f'    "{n}",  # {tag}')
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
