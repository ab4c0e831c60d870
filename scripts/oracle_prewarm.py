"""DuckDB-only prewarm of the oracle-result cache for one fixture dir.

The four-SF sweep's wall clock on a regenerated fixture is dominated by
cold DuckDB oracle runs (the sf10 SRP signature fold alone is ~18 min),
but those runs don't involve Spark at all — so they can overlap the
round's timing-INSENSITIVE phases (pytest, the sf0.01/sf0.1 correctness
sweeps, whose spark_s never feeds the scaling law) instead of serially
padding the timing-sensitive SF1/SF10 sweeps. This script computes every
registry oracle's (rows, columns, multiset digest) for SF_DIR and stores
it through scripts/oracle_cache.py — exactly the records
self_correctness.py would compute inline, so the later sweep becomes
Spark-only on cache hits.

NEVER run this beside a timing-sensitive measurement (bench.py, the
SF1/SF10 sweeps): 32-thread DuckDB is exactly the foreign load the
hostenv guard exists to catch.

Usage: python scripts/oracle_prewarm.py SF_DIR [--only name1,name2]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import oracle_cache  # noqa: E402

from mapreduce_simple_go_spark.operators import all_oracles  # noqa: E402
from tests.conftest import TABLES, rows_digest  # noqa: E402


def main() -> int:
    argv = list(sys.argv[1:])
    only: set[str] | None = None
    if "--only" in argv:
        i = argv.index("--only")
        only = set(argv[i + 1].split(","))
        del argv[i : i + 2]
    if not argv:
        raise SystemExit(__doc__)
    sf_dir = argv[0]
    duck = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        pat = os.path.join(path, "*.parquet") if os.path.isdir(path) else path
        duck.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{pat}')")
    fix_digest = oracle_cache.fixture_digest(sf_dir, TABLES)
    oracles = all_oracles()
    hits = computed = 0
    for name, sql in oracles.items():
        if only is not None and name not in only:
            continue
        if oracle_cache.get(fix_digest, sql) is not None:
            hits += 1
            continue
        t0 = time.monotonic()
        try:
            odf = duck.execute(sql).df()
        except Exception as e:  # record nothing; the sweep will surface it
            print(f"ERR {name}: {e}", flush=True)
            continue
        oracle_s = round(time.monotonic() - t0, 2)
        dig = rows_digest(list(odf.columns), odf.itertuples(index=False, name=None))
        oracle_cache.put(
            fix_digest, sql, len(odf), list(odf.columns), dig, oracle_s
        )
        computed += 1
        print(f"ok {name}: {oracle_s}s rows={len(odf)}", flush=True)
    print(f"# prewarm {sf_dir}: {computed} computed, {hits} already cached")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
