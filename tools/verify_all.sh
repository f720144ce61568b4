#!/usr/bin/env bash
# One-command verification: unit tests -> sf0.01 oracle gate -> sf0.1 bench.
# Usage: bash tools/verify_all.sh
set -euo pipefail
cd "$(dirname "$0")/.."
echo "== 1/3 pytest =="
python -m pytest tests/ -q
echo "== 2/3 driver-sim (every queries() entry vs its DuckDB oracle, sf0.01) =="
python tools/driver_sim.py 2>&1 | grep -vE "WARN|log4j|Stage" | tail -3
echo "== 3/3 bench (sf0.1) =="
python bench.py 2>/dev/null | tail -1
