"""Isolated best-of-N probe for bench watchlist queries.

Runs each named query N times in ONE warm session on an otherwise idle
host and prints min/median/max — the evidence that separates a real plan
regression from the documented 2-7x host jitter (BENCH_HISTORY.md keeps
the resulting table).

Usage: python scripts/bestof.py [-n N] query [query ...]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

import pyspark

os.environ.setdefault("SPARK_HOME", os.path.dirname(pyspark.__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = sys.argv[1:]
    n = 5
    if args and args[0] == "-n":
        n = int(args[1])
        args = args[2:]
    if not args:
        print("usage: bestof.py [-n N] query ...", file=sys.stderr)
        return 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from mapreduce_simple_go_spark.operators import all_queries
    from mapreduce_simple_go_spark.session import get_spark

    registry = all_queries()
    spark = get_spark(app_name="bestof")
    spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).selectExpr(
        "sum(length(text))"
    ).collect()
    spark.range(32).mapInPandas(lambda it: it, schema="id long").collect()

    import gc

    out = {}
    for name in args:
        fn = registry[name]
        times = []
        for _ in range(n):
            t0 = time.monotonic()
            df = fn(spark, sf_dir)
            len(df.collect())
            times.append(round(time.monotonic() - t0, 3))
            spark.catalog.clearCache()
            df = None
            gc.collect()
        out[name] = {
            "min": min(times),
            "median": round(statistics.median(times), 3),
            "max": max(times),
            "runs": times,
        }
        print(f"# {name}: {out[name]}", file=sys.stderr, flush=True)
    spark.stop()
    print(json.dumps({"sf_dir": sf_dir, "n": n, "queries": out}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
