"""Audit the driver-window placement of the `queries()` registry.

The correctness driver checks only the FIRST 50 registry entries per round,
so every entry with no green CORRECTNESS_r*.json row yet (hash-matched, or
rows-only that ran) must sit inside the top 50 slots or it stays invisible
to the scorer.  Exits non-zero if any unproven entry is below the window.

Stale-green detection is AUTOMATIC (VERDICT r3 #2): every query has a
source fingerprint — the q_ wrapper's source, its oracle SQL, and the
source of every ``mod.fn(`` / bare ``fn(`` callable the wrapper invokes,
plus (r8) every callable the wrapper imports FUNCTION-LOCALLY from the
package — snapshotted in scripts/green_fingerprints.json when the entry
was last proven.  Wrappers calling translate_clickhouse_sql additionally hash the
WHOLE dialect module (its rewrite tables change without touching the
entry function), so any dialect edit invalidates dialect-query greens.  A proven entry whose current fingerprint differs is treated as
UNPROVEN (its historical row no longer proves the current output) and must
re-enter the window.  After a driver round lands, refresh the snapshot:

    python scripts/registry_window.py --update

Idle filler slots rotate systematically (VERDICT r9 #3): the audit
prints min(last_green_round) over proven entries plus its histogram, and
``--suggest`` emits the window order that re-proves the OLDEST greens
first — unproven entries lead, then proven filler by ascending last
green round.

Usage: python scripts/registry_window.py [window_size] [--update|--suggest]
"""

from __future__ import annotations

import glob
import hashlib
import inspect
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from clickhouse_flatfile_tool_spark import dialect as _dialect_mod  # noqa: E402

# bare-name calls resolved to whole-module dependencies (see _fingerprint)
_WHOLE_MODULE_DEPS = {"translate_clickhouse_sql": _dialect_mod}

FINGERPRINTS_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "green_fingerprints.json"
)

# Manual override for staleness the fingerprint can't see (kept empty when
# the automatic check suffices).  Round 5: empty — the r4 greens were
# snapshotted at the r4-end commit (3a368d6) via a git worktree, so every
# r5 edit (the dialect probe-gating + INTERPOLATE fixes) is auto-flagged;
# the former tumbling_window/tpch_q10 entries dropped with their r4 greens.
# Round 8: empty again — the fingerprint now resolves function-LOCAL
# imports too (the pipeline_e2e blindness this set covered for one
# audit), and the snapshot was re-taken at the r7-end commit (51d2e1d)
# under the new definition via the worktree protocol.
CHANGED_SINCE_GREEN: set[str] = set()


def _fingerprint(qfn, oracle: str | None) -> str:
    """Hash the query wrapper's source + oracle SQL + the source of every
    callable it references (``mod.fn(`` and bare ``fn(`` forms) — function
    granularity, so editing an operator invalidates exactly the greens
    that call it.  Transitive helpers are out of scope by design (the
    driver re-proves the whole window each round anyway)."""
    try:
        src = inspect.getsource(qfn)
    except (TypeError, OSError):
        src = repr(qfn)
    parts = [src, oracle or ""]
    seen = set()
    # module objects bound to a function-LOCAL name (``... import dedup
    # as _dd``): the ``mod.fn(`` scan below resolves module names via
    # entrymod attributes, which cannot see wrapper-local bindings — r8's
    # ADVICE caught q_pipeline_incremental_prebuilt's _dd.write_corpus_
    # artifacts( calls invisible this way
    local_mods: dict[str, object] = {}
    # function-LOCAL imports (``from pkg.mod import name [as alias]``
    # inside the wrapper body) hide their targets from both call-form
    # scans below — r8 caught pipeline_e2e staled invisibly this way —
    # so resolve and hash those imported callables explicitly
    for mod_path, names_blob in re.findall(
        r"from\s+(clickhouse_flatfile_tool_spark[\w.]*)\s+import\s+"
        r"\(?([\w,\s]+?)\)?\s*(?:\n(?!\s*\w+,)|$)",
        src,
    ):
        try:
            import importlib

            mod = importlib.import_module(mod_path)
        except ImportError:
            continue
        for name_m, alias_m in re.findall(
            r"(\w+)(?:\s+as\s+(\w+))?\s*(?:,|$)", names_blob.strip()
        ):
            name, bound = name_m, (alias_m or name_m)
            if not name or bound in seen:
                continue
            seen.add(bound)
            target = getattr(mod, name, None)
            if inspect.ismodule(target):
                # calls through the alias (``_dd.write_corpus_artifacts(``)
                # are hashed by the mod.fn( scan via local_mods
                local_mods[bound] = target
                continue
            if name in _WHOLE_MODULE_DEPS:
                # the function's own source is NOT enough for these —
                # dialect rewrite closures change without touching the
                # entry point's def (the bare-name branch's rationale);
                # marking it seen here without the module hash would
                # blind the audit to every dialect edit
                parts.append(inspect.getsource(_WHOLE_MODULE_DEPS[name]))
                continue
            if inspect.isfunction(target):
                try:
                    parts.append(inspect.getsource(target))
                except (TypeError, OSError):
                    parts.append(repr(target))
    for mod_name, fn_name in re.findall(r"\b(\w+)\.(\w+)\(", src):
        key = f"{mod_name}.{fn_name}"
        if key in seen:
            continue
        seen.add(key)
        # wrapper-local aliased module imports shadow entrymod attributes
        mod = local_mods.get(mod_name) or getattr(entrymod, mod_name, None)
        target = (
            getattr(mod, fn_name, None) if inspect.ismodule(mod) else None
        )
        if fn_name in _WHOLE_MODULE_DEPS and target is not None:
            # whole-module deps stay whole-module even when called
            # through an aliased module import
            parts.append(inspect.getsource(_WHOLE_MODULE_DEPS[fn_name]))
            continue
        if callable(target):
            try:
                parts.append(inspect.getsource(target))
            except (TypeError, OSError):
                parts.append(repr(target))
    for fn_name in re.findall(r"(?<![\w.])(\w+)\(", src):
        if fn_name in seen:
            continue
        seen.add(fn_name)
        target = getattr(entrymod, fn_name, None)
        if inspect.isfunction(target):
            try:
                parts.append(inspect.getsource(target))
            except (TypeError, OSError):
                parts.append(repr(target))
        elif fn_name in _WHOLE_MODULE_DEPS:
            # cross-module entry points whose behavior spans their whole
            # module (the dialect's rewrite tables/helpers change without
            # touching the entry function's own source) — hash the full
            # module so ANY dialect edit invalidates dialect-query greens
            parts.append(inspect.getsource(_WHOLE_MODULE_DEPS[fn_name]))
    return hashlib.sha256("\n".join(parts).encode()).hexdigest()


def current_fingerprints() -> dict[str, str]:
    oracles = entrymod.oracle_sql()
    return {
        name: _fingerprint(qfn, oracles.get(name))
        for name, qfn in entrymod.queries().items()
    }


def stale_entries() -> set[str]:
    """Proven-looking entries whose implementation drifted since their
    fingerprint snapshot — plus any manual CHANGED_SINCE_GREEN override."""
    if not os.path.exists(FINGERPRINTS_PATH):
        return set(CHANGED_SINCE_GREEN)
    recorded = json.load(open(FINGERPRINTS_PATH))
    cur = current_fingerprints()
    drifted = {n for n, fp in cur.items() if n in recorded and recorded[n] != fp}
    return drifted | CHANGED_SINCE_GREEN

# Entries deliberately parked past the window edge (more unproven entries
# than the 50 driver slots).  Round 9: EMPTY — the r8-deferred WITH FILL
# trio rotated into slots 1-3 as VERDICT r8 #2 required, and the r9 plan
# was sized to land at exactly 50 unproven (43 dialect-family stales from
# the expansion-guard edit + 3 edited re-proves + 4 new entries), so no
# deferral is needed.
# Round 10: hll_rollup — its rows-only→exact-replay oracle upgrade (the
# lg_k=14 sparse-exact finding) landed after the window filled to exactly
# 50 unproven (47 stales + embedding_clusters + semdedup_valid +
# uniq_state_merge, the sibling upgrade from the same finding).  The r8
# WITH-FILL precedent: deferral is ONE round, slot 1 of r11; evidence =
# selfcheck PASS at sf0.001 AND sf0.01 at HEAD (the regenerated
# SELFCHECK_r10_*.json artifacts record it as oracle-pass), and the
# entry's Spark code is unchanged — only the docstring and the new oracle
# SQL differ from its green rows-only-proven form.
#
# The value is the round of deferral, and it is ENFORCED: a deferred
# entry counts as unproven until a driver round AFTER that number proves
# it again.  Without this, the next round's fingerprint refresh (taken at
# the round-end commit, which includes the deferred edit) would make the
# entry look non-stale, its OLD green would count, and the deferral
# contract would silently evaporate — the masking loophole the r8
# precedent handled only by convention.
DEFERRED_SINCE: dict[str, int] = {"hll_rollup": 10}
DEFERRED: set[str] = set(DEFERRED_SINCE)


def main() -> int:
    args = [a for a in sys.argv[1:] if a not in ("--update", "--suggest")]
    if "--update" in sys.argv[1:]:
        json.dump(
            current_fingerprints(),
            open(FINGERPRINTS_PATH, "w"),
            indent=0,
            sort_keys=True,
        )
        print(f"fingerprints refreshed -> {FINGERPRINTS_PATH}")
        return 0
    window = int(args[0]) if args else 50
    # duplicate-key audit: a repeated literal key in the queries() /
    # oracle_sql() dict SILENTLY shadows the earlier value (an oracle
    # that lands in the wrong dict runs rows-only without any error) —
    # fail loudly instead
    import ast as _ast

    src = open(entrymod.__file__).read()
    for fn in _ast.walk(_ast.parse(src)):
        if isinstance(fn, _ast.FunctionDef) and fn.name in ("queries", "oracle_sql"):
            for node in _ast.walk(fn):
                if isinstance(node, _ast.Dict):
                    keys = [
                        k.value for k in node.keys
                        if isinstance(k, _ast.Constant)
                    ]
                    dupes = {k for k in keys if keys.count(k) > 1}
                    if dupes:
                        print(
                            f"DUPLICATE literal keys in {fn.name}(): "
                            f"{sorted(dupes)} — later value shadows earlier"
                        )
                        return 1
    names = list(entrymod.queries().keys())
    stale = stale_entries()
    if stale:
        print(f"stale greens (impl changed since snapshot): {sorted(stale)}")
    proven: set[str] = set()
    # last round each entry was (re-)verified by the driver — green hash
    # OR a rows-only run.  Fingerprints catch code edits, but an entry
    # last proven in r1 has every round since of environment/dependency
    # drift unverified (VERDICT r9 #3): idle window slots should re-prove
    # the OLDEST greens first, so the whole registry re-proof cycles.
    last_green: dict[str, int] = {}
    for f in sorted(glob.glob("CORRECTNESS_r*.json")):
        rnd = int(re.search(r"CORRECTNESS_r(\d+)\.json", f).group(1))
        for k, v in json.load(open(f)).items():
            ran_rows_only = v.get("err") == "no_oracle" and v.get("spark_rows") is not None
            if v.get("hash_match") or ran_rows_only:
                last_green[k] = max(last_green.get(k, 0), rnd)
                if k not in stale:
                    proven.add(k)
    # deferral contract: greens from before (or during) the deferral
    # round do not count — the entry re-enters the window until a LATER
    # driver round proves the deferred form
    for k, since in DEFERRED_SINCE.items():
        if last_green.get(k, 0) <= since:
            proven.discard(k)
    top = names[:window]
    in_window = [n for n in top if n not in proven]
    below = [n for n in names[window:] if n not in proven]
    print(f"registry entries: {len(names)}  window: {window}")
    print(f"unproven inside window: {len(in_window)}")
    print(f"proven filler inside window: {len(top) - len(in_window)}")
    ranked_filler = sorted(
        (n for n in names if n in proven), key=lambda n: (last_green[n], n)
    )
    if ranked_filler:
        import collections

        hist = collections.Counter(last_green[n] for n in ranked_filler)
        print(
            f"min(last_green_round) among proven: {last_green[ranked_filler[0]]}"
            f"  histogram: {dict(sorted(hist.items()))}"
        )
    if "--suggest" in sys.argv[1:]:
        # proposed window: every unproven entry (current registry order),
        # then proven filler OLDEST last-green first — reorder queries()
        # to this and every idle slot re-proves the stalest green
        unproven_all = [n for n in names if n not in proven]
        suggestion = unproven_all + [
            n for n in ranked_filler if n not in unproven_all
        ]
        print(f"suggested window (unproven first, then oldest-green filler):")
        for i, n in enumerate(suggestion[:window]):
            tag = "UNPROVEN" if n not in proven else f"r{last_green[n]}"
            print(f"  {i + 1:3d}. {n}  [{tag}]")
        return 0
    deferred = [n for n in below if n in DEFERRED]
    surprise = [n for n in below if n not in DEFERRED]
    if deferred:
        print(f"deferred past window on purpose (re-rotate next round): {deferred}")
    if surprise:
        print(f"UNPROVEN BELOW WINDOW (invisible to driver): {surprise}")
        return 1
    print("ok: every unproven entry is inside the driver window")
    return 0


if __name__ == "__main__":
    sys.exit(main())
