#!/bin/bash
# Full slow-tier pytest run with a complete, committed -rf report
# (VERDICT r4 weak 3: a tier that never finishes never gates anything —
# two real regressions hid in a killed run's partial log).
#
# Strategy on this 1-core box:
#   - per-FILE invocations so a wedge/timeout loses one file, not the run
#   - the persistent XLA compile cache (tests/conftest.py) makes warm
#     reruns of unchanged programs cheap
#   - everything appends to one log with per-file timing + a final summary
#
# Run ONLY while no TPU job is live (CPU jit contention can deadlock the
# tunnel RPC of a concurrent TPU process — see ROADMAP queue discipline).
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-logs/pytest_slow_r5.log}
mkdir -p logs
: > "$LOG"
fail=0
for f in $(grep -rl "mark.slow" tests/*.py | sort); do
  echo "=== $f $(date +%H:%M:%S) ===" >> "$LOG"
  if ! timeout 1500 python -m pytest "$f" -q -m slow -rf --no-header \
       >> "$LOG" 2>&1; then
    fail=1
    echo "### FAILED-OR-TIMEOUT: $f" >> "$LOG"
  fi
done
echo "=== slow tier complete $(date +%H:%M:%S) fail=$fail ===" >> "$LOG"
grep -E "passed|failed|FAILED-OR-TIMEOUT" "$LOG" | tail -40
exit $fail
