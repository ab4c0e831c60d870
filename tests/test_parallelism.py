"""A8 parity: the engine must actually run tasks concurrently.

The reference's mtiming/rtiming apps assert >= 2 simultaneously-executing
map and reduce tasks via pid liveness files (mtiming.go:19-62,
test-mr.sh:134-185). Spark analog: poll the status tracker while a
multi-partition job with deliberately slow tasks runs.
"""

from __future__ import annotations

import time


def test_at_least_two_concurrent_tasks(spark):
    """Each task reports its own (start, end) wall-clock interval; at least
    two intervals must overlap. This is the reference's liveness-file
    technique (mtiming.go writes pid files and checks simultaneous
    existence) — measuring from inside the tasks, not from the driver's
    status tracker, whose numActiveTasks sampling proved flaky."""
    sc = spark.sparkContext

    def slow_partition(it):
        t0 = time.time()
        time.sleep(1.5)
        n = sum(1 for _ in it)
        return [(t0, time.time(), n)]

    spans = sc.parallelize(range(1000), 8).mapPartitions(slow_partition).collect()
    assert sum(n for _, _, n in spans) == 1000
    overlap = max(
        sum(1 for s2, e2, _ in spans if s2 < e1 and e2 > s1)
        for s1, e1, _ in spans
    )
    assert overlap >= 2, f"no overlapping task intervals: {spans}"
