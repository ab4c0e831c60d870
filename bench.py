"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints one
JSON line with per-query wall-clock seconds.

Timing counts full query execution including the driver-side collect of the
(small) result — the same observable the reference's test harness times
(whole job wall-clock, test-mr.sh).
"""

from __future__ import annotations

import json
import os
import sys
import time

from mapreduce_simple_go_spark.operators import all_queries
from mapreduce_simple_go_spark.session import get_spark

HEADLINE = [
    "wc",
    "inverted_index",
    "per_file_metrics",
    "count_per_key",
    "kv_final_state",
    "kv_get_visible",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_supplier_volume",
    "q4_order_priority",
    "top_customers_per_nation",
    "revenue_by_month",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or "0.1")
    spark = get_spark(app_name="bench")
    # warm the JVM (codegen, shuffle machinery, python workers) outside the
    # timed region so the first query doesn't absorb session startup
    spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).selectExpr(
        "sum(length(text))"
    ).collect()
    registry = all_queries()
    names = [n for n in HEADLINE if n in registry]
    extra = [n for n in sorted(registry) if n not in HEADLINE]
    timings: dict[str, float] = {}
    for name in names + extra:
        fn = registry[name]
        t0 = time.monotonic()
        df = fn(spark, sf_dir)
        # collect (not count) so Catalyst cannot prune the aggregate
        # expressions out of the measured plan; results are small.
        n = len(df.collect())
        timings[name] = round(time.monotonic() - t0, 3)
        print(f"# {name}: {timings[name]}s rows={n}", file=sys.stderr)
        # operators may cache intermediates (LSH signatures etc.); drop them
        # so one query's working set doesn't pressure the next one's
        spark.catalog.clearCache()
    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "total_query_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
