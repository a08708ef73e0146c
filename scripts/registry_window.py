"""Audit the driver-window placement of the `queries()` registry.

The correctness driver checks only the FIRST 50 registry entries per round,
so every entry with no green CORRECTNESS_r*.json row yet (hash-matched, or
rows-only that ran) must sit inside the top 50 slots or it stays invisible
to the scorer.  Exits non-zero if any unproven entry is below the window.

Usage: python scripts/registry_window.py [window_size]
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402

# Entries whose implementation changed AFTER their last green CORRECTNESS
# row — the historical hash row no longer proves the current output, so the
# audit treats them as unproven regardless of what the JSON says.
CHANGED_SINCE_GREEN = {"tumbling_window"}  # r3 avg_value fix; r1 row is stale

# Entries deliberately parked past the window edge this round (more entries
# need rows than the driver checks per round; these have strong local
# pytest/selfcheck evidence and re-rotate next round).
DEFERRED = {
    "tumbling_window",  # stale-green (see above); selfcheck-verified locally
    # rows-only entries parked past the window edge: oracled entries get
    # the contested slots (a hash-green row is stronger evidence than
    # ran-clean); every one is pytest-covered and re-rotates next round
    "pca_project", "sequence_count", "bpe_fertility", "stream_enrich", "bpe_merges",
    "embedding_clusters", "pagerank_docs", "pipeline_curation",
    "stream_quality_gate",
    # displaced by the tier-1d oracled entries (fuzzy_pairs/any_join/
    # jpeg_meta/bm25_rank/hybrid_rrf): hash-green > ran-clean for the
    # contested slots
    "embedding_dedup_lsh", "simhash_verified", "ann_ivf_topk",
    "hll_rollup",
    # oracled entries just past the 50-slot window; selfcheck-green at
    # sf0.01, first in line for the round-4 window
    "hybrid_rrf", "ccnet_buckets", "nb_quality", "paste_join", "ewma",
    # new rows-only this session; pytest recall floors, re-rotates next round
    "pq_topk", "ivfpq_topk",
    # new rows-only this session; pytest batch-equivalence + suppression
    "stream_near_dedup",
}


def main() -> int:
    window = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    names = list(entrymod.queries().keys())
    proven: set[str] = set()
    for f in sorted(glob.glob("CORRECTNESS_r*.json")):
        for k, v in json.load(open(f)).items():
            ran_rows_only = v.get("err") == "no_oracle" and v.get("spark_rows") is not None
            if (v.get("hash_match") or ran_rows_only) and k not in CHANGED_SINCE_GREEN:
                proven.add(k)
    top = names[:window]
    in_window = [n for n in top if n not in proven]
    below = [n for n in names[window:] if n not in proven]
    print(f"registry entries: {len(names)}  window: {window}")
    print(f"unproven inside window: {len(in_window)}")
    print(f"proven filler inside window: {len(top) - len(in_window)}")
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
