"""Interleaved A/B for stream_user_totals_tws: skip_final_nodata_batch
True vs False (r13 driver regression bisect — VERDICT r13 #1).

The flag is toggled via SPARK_GRAFT_STREAM_NODATA (1 = no-data batch kept,
i.e. flag effectively OFF), so both arms run the IDENTICAL registry code
path in ONE warm session, alternating order, min/median over N passes each.

Usage: python scripts/ab_tws.py [N] [--sf DIR]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mapreduce_simple_go_spark.operators.events import stream_user_totals_tws
from mapreduce_simple_go_spark.session import get_spark


def main() -> None:
    argv = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if "--sf" in argv:
        i = argv.index("--sf")
        sf_dir = argv[i + 1]
        del argv[i : i + 2]
    n = int(argv[0]) if argv else 4
    spark = get_spark(app_name="ab-tws")
    # warmup: one untimed run of the entry itself (cold RocksDB/protobuf
    # init would otherwise be charged to whichever arm goes first)
    rows_warm = stream_user_totals_tws(spark, sf_dir).collect()
    spark.catalog.clearCache()

    times: dict[str, list[float]] = {"skip": [], "noskip": []}
    rows: dict[str, int] = {}
    for p in range(n):
        # alternate which arm goes first each pass
        arms = ["skip", "noskip"] if p % 2 == 0 else ["noskip", "skip"]
        for arm in arms:
            os.environ["SPARK_GRAFT_STREAM_NODATA"] = (
                "0" if arm == "skip" else "1"
            )
            t0 = time.monotonic()
            out = stream_user_totals_tws(spark, sf_dir).collect()
            dt = time.monotonic() - t0
            times[arm].append(dt)
            rows[arm] = len(out)
            spark.catalog.clearCache()
            print(f"# pass {p} {arm}: {dt:.3f}s rows={len(out)}", flush=True)
    os.environ.pop("SPARK_GRAFT_STREAM_NODATA", None)
    assert rows["skip"] == rows["noskip"] == len(rows_warm)
    for arm in ("skip", "noskip"):
        t = times[arm]
        print(
            f"{arm}: min={min(t):.3f} median={statistics.median(t):.3f} "
            f"all={[round(x, 3) for x in t]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
