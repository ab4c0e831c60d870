"""E12/E13/A7 parity: task re-execution with exactly-once visible output.

The reference's jobcount test proves tasks may EXECUTE more than once while
the visible result counts each exactly once (test-mr.sh:188-210; duplicate
attempts tolerated by idempotent finish handlers, coordinator.go:175-208).
Spark analog: with task retries enabled, a task that fails on its first
attempt re-executes; an invocation accumulator shows > N executions while
the job result reflects each partition exactly once.

Runs in a subprocess because retry semantics need a dedicated master
(local[4,4] = 4 threads, maxFailures=4) and one JVM can host one context.
"""

from __future__ import annotations

import subprocess
import sys

SCRIPT = r"""
import sys
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[4,4]").appName("retry-test")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
sc = spark.sparkContext
MARKER_DIR = sys.argv[1]

def work(split_index, it):
    # one marker file per task INVOCATION — the reference's jobcount design
    # (mr-worker-jobcount files, jobcount.go:22-32); accumulators won't do:
    # Spark discards updates from failed attempts.
    import os, uuid
    from pyspark import TaskContext

    os.makedirs(MARKER_DIR, exist_ok=True)
    open(os.path.join(MARKER_DIR, f"inv-{uuid.uuid4().hex}"), "w").close()
    ctx = TaskContext.get()
    if split_index == 3 and ctx.attemptNumber() == 0:
        raise RuntimeError("injected first-attempt failure (crash.go analog)")
    yield (split_index, sum(1 for _ in it))

result = dict(
    sc.parallelize(range(800), 8).mapPartitionsWithIndex(work).collect()
)
import os
invocations = len(os.listdir(MARKER_DIR))
assert result == {i: 100 for i in range(8)}, f"wrong visible output: {result}"
assert invocations > 8, f"expected a re-executed task, got {invocations}"
print(f"OK invocations={invocations} partitions=8")
spark.stop()
"""


def test_failed_task_reexecutes_with_exactly_once_output(tmp_path):
    proc = subprocess.run(
        [sys.executable, "-c", SCRIPT, str(tmp_path / "flag")],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "OK invocations=" in proc.stdout
