#!/usr/bin/env python
"""Capture .explain('formatted') for named registry queries into
plans/<round>/<name>_<suffix>.txt (the optimization-round evidence
files the judge diffs).

Run: python tools/explain_capture.py <round_dir> <suffix> name1,name2,...
e.g. python tools/explain_capture.py plans/r15 before stats_spearman_corr
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    round_dir = sys.argv[1]
    suffix = sys.argv[2]
    names = sys.argv[3].split(",")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from duckdb_extension_clickhouse_native_spark import get_spark
    import __spark_entry__  # noqa: F401 - populates REGISTRY
    from duckdb_extension_clickhouse_native_spark.plans.base import REGISTRY

    spark = get_spark(app_name="explain-capture", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(os.path.join(REPO, round_dir), exist_ok=True)
    all_q = REGISTRY.all()
    for name in names:
        df = all_q[name].build(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        out = os.path.join(REPO, round_dir, f"{name}_{suffix}.txt")
        with open(out, "w") as f:
            f.write(f"# {name} — explain('formatted') at {sf_dir}\n\n")
            f.write(plan)
        print(f"wrote {out} ({len(plan)} chars)")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
