"""Repo-side replica of the driver's full correctness gate, for ALL queries.

The round driver verifies the first 50 registry entries; this sweep runs
every registered query against its DuckDB oracle at the driver's scale
factor and records the same three verdicts (rows/schema/hash) per name, so
the registry tail has on-record evidence too.

Usage:  python scripts/self_correctness.py [out.json] [--only name1,name2]
Env:    SPARK_GRAFT_TEST_SF_DIR (default /root/testdata/sf0.01)
"""

from __future__ import annotations

import json
import os
import sys
import traceback

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mapreduce_simple_go_spark.operators import all_oracles, all_queries  # noqa: E402
from mapreduce_simple_go_spark.session import get_spark  # noqa: E402
from tests.conftest import TABLES, rows_digest  # noqa: E402


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")
    argv = list(sys.argv[1:])
    only: set[str] | None = None
    if "--only" in argv:
        i = argv.index("--only")
        only = set(argv[i + 1].split(","))
        del argv[i : i + 2]
    out_path = argv[0] if argv else "CORRECTNESS_SELF_r03.json"
    spark = get_spark(app_name="self-correctness")
    duck = duckdb.connect()
    for t in TABLES:
        # driver fixtures are single files; scaled local fixtures are
        # Spark-written DIRECTORIES of part files — glob those for DuckDB
        path = os.path.join(sf_dir, f"{t}.parquet")
        pat = os.path.join(path, "*.parquet") if os.path.isdir(path) else path
        duck.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{pat}')"
        )
    queries, oracles = all_queries(), all_oracles()
    results: dict[str, dict] = {}
    for name, fn in queries.items():
        if only is not None and name not in only:
            continue
        rec = {
            "rows_match": False,
            "schema_match": False,
            "hash_match": False,
            "spark_rows": None,
            "oracle_rows": None,
            "err": None,
        }
        try:
            import time

            t0 = time.monotonic()
            sdf = fn(spark, sf_dir).toPandas()
            rec["spark_s"] = round(time.monotonic() - t0, 2)
            t0 = time.monotonic()
            odf = duck.execute(oracles[name]).df()
            rec["oracle_s"] = round(time.monotonic() - t0, 2)
            rec["spark_rows"], rec["oracle_rows"] = len(sdf), len(odf)
            rec["rows_match"] = len(sdf) == len(odf)
            rec["schema_match"] = sorted(sdf.columns) == sorted(odf.columns)
            # multiset digest, equality-equivalent to the sorted rows_key
            # form (see conftest.rows_digest) — one pass, O(1) memory; the
            # tuple sort dominated the sf10 sweep's wall clock through r8
            s_rows = rows_digest(
                list(sdf.columns), sdf.itertuples(index=False, name=None)
            )
            o_rows = rows_digest(
                list(odf.columns), odf.itertuples(index=False, name=None)
            )
            rec["hash_match"] = s_rows == o_rows
        except Exception:
            rec["err"] = traceback.format_exc(limit=3)
        results[name] = rec
        spark.catalog.clearCache()
        # free pandas frames + any localCheckpoint blocks before the next
        # query — matters when sweeping the 100x fixture in one session
        sdf = odf = None  # noqa: F841
        import gc

        gc.collect()
        flags = "".join(
            "+" if rec[k] else "-" for k in ("rows_match", "schema_match", "hash_match")
        )
        print(f"{flags} {name}" + (f"  ERR" if rec["err"] else ""), flush=True)
        # incremental write: a long at-scale sweep keeps its progress on
        # disk even if the host or a pathological query kills the run
        with open(out_path, "w") as f:
            json.dump(results, f, indent=2)
    spark.stop()
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    n_green = sum(
        1
        for r in results.values()
        if r["rows_match"] and r["schema_match"] and r["hash_match"]
    )
    print(f"\n{n_green}/{len(results)} green -> {out_path}")
    return 0 if n_green == len(results) else 1


if __name__ == "__main__":
    sys.exit(main())
