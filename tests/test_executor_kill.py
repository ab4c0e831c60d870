"""Real executor-process-death fault parity (crash.go's os.Exit arm).

The in-JVM fault tests (test_fault_tolerance.py) cover stalls; this one
covers the actual process-kill arm of the reference's crash test
(src/mrapps/crash.go:20-32 + test-mr.sh:271-317): a worker JVM SIGKILLed
mid-map-stage must not change the job's visible output.

Needs its own SparkContext (master=local-cluster[2,1,1024]), so it runs
scripts/executor_kill_check.py as a subprocess — one JVM per process is a
Spark constraint, not a shortcut.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_executor_kill_output_identical():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "executor_kill_check.py")],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=REPO,
    )
    sys.stdout.write(proc.stdout[-2000:])
    sys.stderr.write(proc.stderr[-2000:])
    assert proc.returncode == 0, "executor-kill differential failed"
    assert "PASS" in proc.stdout
    assert "killed executor JVM" in proc.stdout
