"""Composition fuzz for the dialect translator's call rewrites.

The r8 deep-fuzz found reinterpretAsUInt64∘reinterpretAsString exploding
to 587 KB of SQL (multiplicative argument splicing); the r9 sweep found
formatReadableTimeDelta doing the same (134 KB at depth 3).  Both are
now let-bound and `_rewrite_call` carries a translate-time size guard
(`_MAX_REWRITE_CHARS`) — this script is the recurring audit that keeps
the class extinct as new rewrites land:

  1. SELF-COMPOSITION: every call-rewritten name f, f(f(f(lit))) 3 deep
     — translate, bound the output size, Spark-ANALYZE (no execution).
  2. PAIRS: f(g(lit)) over every pair of unary-working seeds.

Flags: translate exceptions other than the guard's own ValueError,
output size > 80 KB (multiplicative growth smell well under the hard
guard), and analyzer iteration/stack blow-ups.  Depth-1-broken shapes
(type mismatches the fuzz shape causes) are skipped — they are not
bugs.  Exit code 1 when anything is flagged.

  3. TRIPLES (sampled): f(g(h(lit))) over a fixed-seed random sample of
     the ~1.8M triple space — the depth the r9 offenders needed to show
     multiplicative growth, now probed across DIFFERENT-name stacks too.

Usage: python scripts/fuzz_dialect.py [--self-only|--pairs-only|--triples-sample[=N]]
Runtime: ~2 min self, ~30 min pairs, ~N/500 min triples (local[32]).
"""

from __future__ import annotations

import itertools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clickhouse_flatfile_tool_spark import get_spark  # noqa: E402
from clickhouse_flatfile_tool_spark import dialect as _dialect  # noqa: E402
from clickhouse_flatfile_tool_spark.dialect import (  # noqa: E402
    _MAX_REWRITE_CHARS,
    translate_clickhouse_sql as tr,
)

BIG = 80_000
LITS = ["'abcdefgh'", "12345", "1.5", "('a', 'b')"]


def rewrite_names() -> list[str]:
    """Record every name the rewrite chain registers by RUNNING it once
    with a spy on _rewrite_call — no per-function gating exists, so one
    translate visits every registration, including loop/f-string/dict
    forms a static regex misses (the r9 review found the single-line
    regex saw 238 of the 404 registered names)."""
    recorded: set[str] = set()
    orig = _dialect._rewrite_call

    def spy(chunk, name, make):
        recorded.add(name)
        return orig(chunk, name, make)

    _dialect._rewrite_call = spy
    try:
        tr("SELECT 1")
    finally:
        _dialect._rewrite_call = orig
    return sorted(recorded)


def main() -> int:
    mode = sys.argv[1] if len(sys.argv) > 1 else ""
    names = rewrite_names()
    spark = get_spark(app_name="dialect-fuzz")
    spark.sparkContext.setLogLevel("ERROR")

    def analyzes(sql: str) -> tuple[bool, str]:
        try:
            spark.sql(sql).schema
            return True, ""
        except Exception as e:  # noqa: BLE001
            return False, str(e).split("\n")[0][:140]

    issues: list[tuple] = []
    seeds: list[tuple[str, str]] = []
    for n in names:
        for lit in LITS:
            try:
                t1 = tr(f"SELECT {n}({lit}) AS v")
            except Exception:  # noqa: BLE001
                continue
            ok, _ = analyzes(t1)
            if ok:
                seeds.append((n, lit))
                break

    # non-guard translate-time ValueErrors are reported but SOFT: several
    # rewrites deliberately raise on non-literal arguments (geohashesInBox
    # etc.), which nesting necessarily produces — a deliberate raise is
    # designed behavior, not a splice bug.  Only the guard's own message
    # is silently accepted.
    soft: list[tuple] = []

    def classify_ve(e: ValueError):
        return "guard" if "grew the statement" in str(e) else "other"

    if mode != "--pairs-only":
        for n, lit in seeds:
            expr = f"{n}({n}({n}({lit})))"
            try:
                t3 = tr(f"SELECT {expr} AS v")
            except ValueError as e:
                if classify_ve(e) == "other":
                    soft.append((n, lit, "TRANSLATE-VE", str(e)[:120]))
                continue
            except Exception as e:  # noqa: BLE001
                issues.append((n, lit, "TRANSLATE-EXC", str(e)[:120]))
                continue
            if len(t3) > BIG:
                issues.append((n, lit, "BIG", len(t3)))
                continue
            ok, err = analyzes(t3)
            if not ok and ("MAX_ITERATIONS" in err or "StackOverflow" in err):
                issues.append((n, lit, "ANALYZER", err))
        print(f"self-composition: {len(seeds)} seeds checked")

    if mode.startswith("--triples-sample"):
        import random

        n_sample = int(mode.partition("=")[2] or 6000)
        rng = random.Random(42)  # fixed seed: reruns probe the same set
        fs = [s[0] for s in seeds]
        triples = {
            (rng.choice(fs), rng.choice(fs), rng.choice(range(len(seeds))))
            for _ in range(n_sample)
        }
        for f, g, hi in sorted(triples):
            h, lit = seeds[hi]
            try:
                t = tr(f"SELECT {f}({g}({h}({lit}))) AS v")
            except ValueError as e:
                if classify_ve(e) == "other":
                    soft.append((f, g, h, lit, "TRANSLATE-VE", str(e)[:120]))
                continue
            except Exception as e:  # noqa: BLE001
                issues.append((f, g, h, lit, "TRANSLATE-EXC", str(e)[:120]))
                continue
            if len(t) > BIG:
                issues.append((f, g, h, lit, "BIG", len(t)))
                continue
            ok, err = analyzes(t)
            if not ok and ("MAX_ITERATIONS" in err or "StackOverflow" in err):
                issues.append((f, g, h, lit, "ANALYZER", err))
        print(f"triples: {len(triples)} sampled compositions checked")

    if mode == "--self-only" or mode.startswith("--triples-sample"):
        pairs = []
    else:
        pairs = list(itertools.product([s[0] for s in seeds], seeds))
    if pairs:
        for f, (g, lit) in pairs:
            try:
                t = tr(f"SELECT {f}({g}({lit})) AS v")
            except ValueError as e:
                if classify_ve(e) == "other":
                    soft.append((f, g, lit, "TRANSLATE-VE", str(e)[:120]))
                continue
            except Exception as e:  # noqa: BLE001
                issues.append((f, g, lit, "TRANSLATE-EXC", str(e)[:120]))
                continue
            if len(t) > BIG:
                issues.append((f, g, lit, "BIG", len(t)))
                continue
            ok, err = analyzes(t)
            if not ok and ("MAX_ITERATIONS" in err or "StackOverflow" in err):
                issues.append((f, g, lit, "ANALYZER", err))
        print(f"pairs: {len(pairs)} compositions checked")

    for s in soft:
        print("soft (deliberate translate-time raise under nesting):", s)
    for i in issues:
        print("ISSUE:", i)
    print(
        f"issues: {len(issues)}  soft: {len(soft)}  "
        f"(guard cap {_MAX_REWRITE_CHARS})"
    )
    spark.stop()
    return 1 if issues else 0


if __name__ == "__main__":
    sys.exit(main())
