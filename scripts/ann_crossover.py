"""Measure the brute-force vs IVF crossover for embedding near-dup.

embedding_near_dup is quadratic inside its MAX_BRUTE_ROWS gate (the r6
sf1 sweep measured 22.7x cost for 10x data); this script replaces the
100 MB-broadcast heuristic with a MEASURED crossover: time the forced
brute path and the IVF path on fixtures of increasing embedding count,
fit brute ~ a*n^2 and ivf ~ b*n + c, and report where brute stops
winning. Timing uses a noop-sink count of the pair stream (py4j row
transfer would otherwise dominate the larger fixtures — see
.claude/../verify notes in BENCH_HISTORY.md).

Usage: python scripts/ann_crossover.py [fixture_dir ...]
       (default: sf0.01, sf0.1, .localdata/sf1, .localdata/sf10)
"""

from __future__ import annotations

import os
import sys
import time

import pyspark

os.environ.setdefault("SPARK_HOME", os.path.dirname(pyspark.__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mapreduce_simple_go_spark.operators.similarity import (  # noqa: E402
    _emb,
    embedding_near_dup,
    embedding_near_dup_ivf,
)
from mapreduce_simple_go_spark.session import get_spark  # noqa: E402

PASSES = 2
THRESHOLD = 0.45


def time_df(df) -> float:
    t0 = time.monotonic()
    df.write.format("noop").mode("overwrite").save()
    return time.monotonic() - t0


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    dirs = sys.argv[1:] or [
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
        os.path.join(repo, ".localdata", "sf1"),
        os.path.join(repo, ".localdata", "sf10"),
    ]
    spark = get_spark(shuffle_partitions=32)
    # warm JVM + python daemon untimed
    spark.range(1000).selectExpr("sum(id)").collect()
    print("| fixture | n_emb | brute best (s) | ivf best (s) | ratio |")
    print("|---|---|---|---|---|")
    rows = []
    for d in dirs:
        if not os.path.isdir(d):
            print(f"(skip {d}: missing)")
            continue
        n = _emb(spark, d).count()
        brute = min(
            time_df(
                embedding_near_dup(spark, d, THRESHOLD, max_brute_rows=10**12)
            )
            for _ in range(PASSES)
        )
        ivf = min(
            time_df(embedding_near_dup_ivf(spark, d, THRESHOLD))
            for _ in range(PASSES)
        )
        rows.append((n, brute, ivf))
        print(
            f"| {os.path.basename(d.rstrip('/'))} | {n} | {brute:.2f} "
            f"| {ivf:.2f} | {brute / ivf:.2f} |"
        )
    # fit brute = a*n^2 (dominant term, through the largest point) and
    # ivf = linear interpolation; crossover where fitted curves meet
    if len(rows) >= 2:
        n_big, brute_big, _ = rows[-1]
        a = brute_big / (n_big**2)
        # linear fit for ivf through first/last points
        n0, _, ivf0 = rows[0]
        n1, _, ivf1 = rows[-1]
        slope = (ivf1 - ivf0) / max(n1 - n0, 1)
        lo, hi = 1, 10 * n_big
        while lo < hi:
            mid = (lo + hi) // 2
            if a * mid * mid < ivf0 + slope * (mid - n0):
                lo = mid + 1
            else:
                hi = mid
        print(f"\nfitted brute a*n^2: a={a:.3e}; ivf linear slope={slope:.3e}s/row")
        print(f"estimated crossover: n ~= {lo}")
    spark.stop()


if __name__ == "__main__":
    main()
