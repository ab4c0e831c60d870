#!/usr/bin/env bash
# Flakiness amplification — the analog of the reference's test-mr-many.sh
# (/root/reference/src/main/test-mr-many.sh:15-22): rerun the fault/timing
# test suite N times with a per-trial timeout, failing on the first red
# trial. Scheduling-sensitive tests (stall injection, parallelism probes,
# output stability, task retry) only betray their flakiness across repeated
# trials.
#
# Usage: scripts/test-many.sh [N]   (default 3)
set -u
N="${1:-3}"
SUITE=(
  tests/test_fault_tolerance.py
  tests/test_task_retry.py
  tests/test_output_stability.py
  tests/test_parallelism.py
  tests/test_streaming_recovery.py
  tests/test_streaming.py
  tests/test_executor_kill.py
)
for i in $(seq 1 "$N"); do
  echo "=== trial $i/$N ==="
  if ! timeout 900 python -m pytest "${SUITE[@]}" -q; then
    echo "*** FAILED on trial $i ***"
    exit 1
  fi
done
echo "*** PASSED $N/$N trials ***"
