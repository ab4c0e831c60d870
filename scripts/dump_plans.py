"""Dump .explain('formatted') for named registry queries to
plans/$SPARK_GRAFT_PLANS_ROUND/ (default r14).

Usage: python scripts/dump_plans.py <suffix> name1 name2 ...
Writes plans/r13/<name>_<suffix>.txt for each query. Streaming entries
(which drain eagerly at build time) get the plan of the RETURNED frame —
for those the interesting shape is the drain, so we also note the entry is
post-drain in the header.
"""

from __future__ import annotations

import io
import os
import sys

from contextlib import redirect_stdout

# same bootstrap as plan_audit.py (r13 ADVICE): make the package importable
# regardless of the invoking cwd
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mapreduce_simple_go_spark.operators import all_queries  # noqa: E402
from mapreduce_simple_go_spark.session import get_spark  # noqa: E402

OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r14"),
)


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="dump-plans")
    registry = all_queries()
    os.makedirs(OUT_DIR, exist_ok=True)
    for name in names:
        df = registry[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(OUT_DIR, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} @ {sf_dir} — df.explain('formatted')\n")
            f.write(buf.getvalue())
        print(f"wrote {path}", file=sys.stderr)
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
