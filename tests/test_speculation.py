"""Speculative-execution differential (E12's straggler arm).

The conf surface + stall-injection tests (test_fault_tolerance.py) and
the executor-kill differential (test_executor_kill.py) cover crash
recovery; this covers straggler DETECTION end-to-end: under a real
local-cluster with spark.speculation=true, an injected straggler must be
marked speculatable by the live scheduler while job output stays
identical to the clean expectation. See scripts/speculation_check.py for
why the speculative LAUNCH itself cannot be demonstrated on one host
(Spark's different-host scheduling exclusion — correct cluster behavior).

Reference analog: src/main/test-mr.sh:134-185 (mtiming/rtiming probes —
the job must make progress observable despite slow workers).
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_straggler_marked_speculatable_output_identical():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "speculation_check.py")],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=REPO,
    )
    sys.stdout.write(proc.stdout[-2000:])
    sys.stderr.write(proc.stderr[-2000:])
    assert proc.returncode == 0, "speculation differential failed"
    assert "PASS" in proc.stdout
    assert "marked speculatable" in proc.stdout
