"""Plan audit over the whole registry: one formatted physical plan per
batch entry, scanned for the guide's red flags (§2 accidental Exchanges,
§3 join strategy, §4 Python-boundary nodes, §5 collects).

Writes plans/r13/plan_audit.json: per entry, node-marker counts and the
first PushedFilters line. Entries that materialize eagerly (streaming
drains, localCheckpoint returns, driver-tier collects) are tagged
"eager" — their returned plan is a scan of the materialized result, so
the audit records that fact instead of a meaningless plan.

Usage: python scripts/plan_audit.py [out.json] [--sf DIR]
"""

from __future__ import annotations

import io
import json
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mapreduce_simple_go_spark.operators import all_queries  # noqa: E402
from mapreduce_simple_go_spark.session import get_spark  # noqa: E402

MARKERS = [
    "Exchange",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
    "BatchEvalPython",
    "ArrowEvalPython",
    "MapInPandas",
    "MapInArrow",
    "FlatMapGroupsInPandas",
    "PythonUDTF",
    "Window",
    "Generate",
    "TakeOrderedAndProject",
    "CollectLimit",
    "InMemoryTableScan",
]
# plans whose source is a materialized intermediate, not the computation
EAGER_SCAN = re.compile(r"Scan ExistingRDD|LocalTableScan")


def main() -> None:
    argv = [a for a in sys.argv[1:]]
    sf_dir = "/root/testdata/sf0.1"
    if "--sf" in argv:
        i = argv.index("--sf")
        sf_dir = argv[i + 1]
        del argv[i : i + 2]
    out_path = argv[0] if argv else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r13", "plan_audit.json",
    )
    spark = get_spark(app_name="plan-audit")
    results: dict[str, dict] = {}
    for name, fn in sorted(all_queries().items()):
        rec: dict = {}
        try:
            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
            body = plan.split("\n\n", 1)[0]  # numbered operator list only
            rec["counts"] = {
                m: len(re.findall(rf"\b{m}\b[^(\n]*\(\d+\)", body))
                for m in MARKERS
            }
            rec["counts"] = {k: v for k, v in rec["counts"].items() if v}
            # eager-scan presence and Exchange count recorded SEPARATELY
            # (r13 ADVICE): conjoining them tagged any entry whose returned
            # plan scans a materialized intermediate but still contains an
            # Exchange as eager=false, understating how many plans hide the
            # real computation. "eager" keeps its old meaning (pure scan of
            # a materialized result) for existing consumers.
            rec["eager_scan"] = bool(EAGER_SCAN.search(body))
            rec["exchange_count"] = rec["counts"].get("Exchange", 0)
            rec["eager"] = rec["eager_scan"] and rec["exchange_count"] == 0
            pushed = re.findall(r"PushedFilters: \[[^\]]*\]", plan)
            nontrivial = [p for p in pushed if p != "PushedFilters: []"]
            rec["pushed_filters"] = nontrivial[:3]
        except Exception as exc:  # noqa: BLE001 — audit must cover the rest
            rec["err"] = f"{type(exc).__name__}: {exc}"[:300]
        results[name] = rec
        spark.catalog.clearCache()
        print(f"# {name}: {rec.get('counts', rec.get('err'))}", file=sys.stderr)
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {out_path} ({len(results)} entries)")
    spark.stop()


if __name__ == "__main__":
    main()
