"""Driver-contract integrity checks (no SparkSession needed).

The driver consumes three surfaces from ``__spark_entry__``: the first 50
``queries()`` entries (the window), ``oracle_sql()`` twins, and
``bench.py``'s query list.  Each has a silent failure mode a typo could
cause — a bench name that resolves to nothing only fails at bench time, a
window list entry missing from the registry only fails at driver time, an
oracle keyed to a name ``queries()`` doesn't export silently never runs.
These run at pytest speed so the failure shows up before any round gate.
"""

from __future__ import annotations

import bench as benchmod
import __spark_entry__ as entrymod
import scripts.registry_window as rw


def test_bench_names_all_resolve():
    registry = entrymod.queries()
    missing = [
        n
        for n in benchmod.BENCH_QUERIES
        if n not in registry and not hasattr(entrymod, f"q_{n}")
    ]
    assert missing == [], f"bench names with no registry entry or q_ fallback: {missing}"


def test_window_list_is_the_registry_head():
    names = list(entrymod.queries())
    win = entrymod._WINDOW_R10
    assert len(win) == 50
    assert len(set(win)) == 50, "duplicate names in the window list"
    assert names[:50] == win, "queries() does not hoist the declared window"


def test_oracles_keyed_to_registry_entries():
    # r3-pruned near-duplicate variants keep their q_ function and oracle
    # (the bench fallback convention) without a registry slot — those are
    # the only sanctioned orphans
    qs = set(entrymod.queries())
    orphans = sorted(set(entrymod.oracle_sql()) - qs)
    unsanctioned = [n for n in orphans if not hasattr(entrymod, f"q_{n}")]
    assert unsanctioned == [], (
        f"oracle_sql keys with neither a queries() entry nor a q_ "
        f"fallback: {unsanctioned}"
    )


def test_deferred_entries_exist_and_are_below_window():
    names = list(entrymod.queries())
    win = set(names[:50])
    for name in rw.DEFERRED:
        assert name in names, f"DEFERRED entry not in registry: {name}"
        assert name not in win, (
            f"DEFERRED entry {name} is inside the window — deferral and "
            "window placement are mutually exclusive"
        )
    assert set(rw.DEFERRED_SINCE) == set(rw.DEFERRED)
