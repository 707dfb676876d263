#!/usr/bin/env bash
# One-command local replica of the FULL driver gate:
#   1. Verify          — dump every SparkEntry query at the given SF
#   2. check_oracle.py — DuckDB cell-exact comparison (the driver's gate)
#   3. check_types.py  — result-dtype hash-risk linter
#   4. StreamGate      — stream/batch CDC parity over the same fixtures
#                        (the streaming surface the DuckDB oracle can't see)
#   5. StreamingSpec   — the full streaming batch-parity suite
#
# Usage: tools/gate.sh [sfDir] [outDir]
# Exits nonzero on the first failing stage.
set -euo pipefail
SF=${1:-/root/testdata/sf0.01}
OUT=${2:-/tmp/gate_out}
cd "$(dirname "$0")/.."

sbt -batch "runMain graft.Verify $SF $OUT"
python3 tools/check_oracle.py "$SF" "$OUT"
python3 tools/check_types.py "$SF" "$OUT"
sbt -batch "runMain graft.StreamGate $SF"
sbt -batch "testOnly graft.StreamingSpec"
echo "[gate] all green"
