#!/usr/bin/env bash
# Full verification battery, in the order of fastest feedback first.
# Usage: bash scripts/ci.sh [sf_dir]   (default oracle scale: sf0.01)
set -euo pipefail
cd "$(dirname "$0")/.."
SF=${1:-/root/testdata/sf0.01}

echo "== pytest =="
python -m pytest tests/ -q

echo "== oracle differential (selfcheck @ ${SF}) =="
python scripts/selfcheck.py "${SF}" 2>/dev/null | tail -3

echo "== plan audit (anti-pattern sweep) =="
python scripts/plan_audit.py 2>/dev/null | tail -2

echo "== registry window placement =="
python scripts/registry_window.py 2>/dev/null | tail -3

echo "== bench (sf0.1) =="
python bench.py 2>/dev/null | tail -1
