"""Sweep every queries() entry's physical plan for 100 TB anti-patterns.

Flags:
  * CartesianProduct — O(n*m), never acceptable on big sides
  * row-at-a-time Python UDF (BatchEvalPython) — only Arrow paths
    (ArrowEvalPython / mapInPandas / FlatMapGroupsInPandas) are allowed
  * parquet scans with neither pushed filters nor a pruned schema when the
    query filters/projects (heuristic: report-only)

Exit code 1 if any hard flag fires.  Usage: python scripts/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from clickhouse_flatfile_tool_spark import get_spark
from clickhouse_flatfile_tool_spark.plans import explain_str

HARD_FLAGS = ["CartesianProduct", "BatchEvalPython"]
# streaming plans can't be inspected via executedPlan without starting a query
SKIP_PREFIX = "stream_"


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    failures: list[str] = []
    for name, fn in sorted(entrymod.queries().items()):
        if name.startswith(SKIP_PREFIX):
            continue
        try:
            plan = explain_str(fn(spark, sf_dir))
        except Exception as e:  # noqa: BLE001
            failures.append(f"{name}: plan build failed: {e}")
            continue
        flags = [f for f in HARD_FLAGS if f in plan]
        arrow = ("ArrowEvalPython" in plan) or ("InPandas" in plan)
        print(
            f"{name:24s} {'FLAG ' + ','.join(flags) if flags else 'ok':28s} "
            f"arrow_udf={'y' if arrow else '-'}"
        )
        for f in flags:
            failures.append(f"{name}: {f}")
    if failures:
        print("\nANTI-PATTERNS FOUND:")
        for f in failures:
            print(" ", f)
        sys.exit(1)
    print("\nall plans clean")


if __name__ == "__main__":
    main()
