"""A8 parity: the engine must actually run tasks concurrently.

The reference's mtiming/rtiming apps assert >= 2 simultaneously-executing
map and reduce tasks via pid liveness files (mtiming.go:19-62,
test-mr.sh:134-185). Spark analog: poll the status tracker while a
multi-partition job with deliberately slow tasks runs.
"""

from __future__ import annotations

import threading
import time


def test_at_least_two_concurrent_tasks(spark):
    sc = spark.sparkContext

    def slow_partition(it):
        time.sleep(1.5)
        return [sum(1 for _ in it)]

    peak = {"n": 0}
    done = threading.Event()

    def poll():
        tracker = sc.statusTracker()
        while not done.is_set():
            for sid in tracker.getActiveStageIds():
                info = tracker.getStageInfo(sid)
                if info:
                    peak["n"] = max(peak["n"], info.numActiveTasks)
            time.sleep(0.05)

    t = threading.Thread(target=poll, daemon=True)
    t.start()
    try:
        counts = sc.parallelize(range(1000), 8).mapPartitions(slow_partition).collect()
    finally:
        done.set()
        t.join(timeout=5)
    assert sum(counts) == 1000
    assert peak["n"] >= 2, f"expected concurrent tasks, peak={peak['n']}"
