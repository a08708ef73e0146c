"""Targeted per-query measurement harness for the r11 optimization round.

Times named ``queries()`` entries (or bench-only ``q_*`` fallbacks) with the
bench methodology — noop sink, best-of-N, warm session — and optionally dumps
``.explain('formatted')`` to ``plans/r11/<name>_<tag>.txt`` so plan claims in
OPTIMIZATION_r11.md are verifiable offline.

Usage:
  python scripts/r11_probe.py [--sf DIR] [--n N] [--plans TAG]
                              [--plans-dir DIR] name [name ...]

Prints one line per query: ``<name> <best_sec> <all_runs>``.
``--plans-dir`` defaults to ``plans/r11``; later rounds pass ``plans/r12``
etc. so the same harness serves every optimization round.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from clickhouse_flatfile_tool_spark import get_spark  # noqa: E402
from clickhouse_flatfile_tool_spark.plans import explain_str  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    n = 3
    plans_tag = None
    plans_dir = None
    names: list[str] = []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--sf":
            sf_dir = args[i + 1]
            i += 2
        elif a == "--n":
            n = int(args[i + 1])
            i += 2
        elif a == "--plans":
            plans_tag = args[i + 1]
            i += 2
        elif a == "--plans-dir":
            plans_dir = args[i + 1]
            i += 2
        else:
            names.append(a)
            i += 1
    if not names:
        print(__doc__)
        sys.exit(2)

    extra = {}
    pgc = os.environ.get("R11_PERIODIC_GC")
    if pgc:
        extra["spark.cleaner.periodicGC.interval"] = pgc
    spark = get_spark(app_name="cfts-r11-probe", extra_conf=extra or None)
    spark.sparkContext.setLogLevel("ERROR")
    clean = bool(os.environ.get("R11_CLEAN"))
    registry = entrymod.queries()

    def get_q(name):
        fn = registry.get(name) or getattr(entrymod, f"q_{name}", None)
        if fn is None:
            sys.exit(
                f"unknown query {name!r}: not in queries() registry and no "
                f"q_{name} fallback in __spark_entry__"
            )
        return fn

    # bench.py warm-up: trivial JVM action + one Arrow action so worker fork
    # and numpy import never land inside a timed run
    get_q("count")(spark, sf_dir).collect()
    spark.range(64).repartition(32).mapInPandas(
        lambda it: (pdf for pdf in it), "id long"
    ).write.format("noop").mode("overwrite").save()

    if plans_dir is None:
        plans_dir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "plans", "r11",
        )
    if plans_tag:
        os.makedirs(plans_dir, exist_ok=True)

    for name in names:
        fn = get_q(name)
        if plans_tag:
            df = fn(spark, sf_dir)
            with open(os.path.join(plans_dir, f"{name}_{plans_tag}.txt"), "w") as f:
                f.write(explain_str(df))
        runs = []
        for _ in range(n):
            spark.sparkContext.setJobDescription(f"r11probe:{name}")
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        if clean:
            import gc

            gc.collect()
            spark.sparkContext._jvm.System.gc()  # noqa: SLF001
        print(f"{name:32s} {min(runs):8.3f}  runs={runs}", flush=True)


if __name__ == "__main__":
    main()
