"""Scaling-exponent sweep: heavy-tail queries at sf0.1 vs the 10x fixture.

For each query: best-of-N warm wall-clock at both scale factors, then
exponent = log(t_big / t_small) / log(factor). 1.0 = perfectly linear;
< 1 = fixed overheads still dominate; >> 1 = a plan that stopped scaling.
Run AFTER `python scripts/make_scaled_fixture.py` and on an otherwise idle
host (the documented 2-7x jitter applies; best-of-N takes the min).

Usage: python scripts/scale_sweep.py [--passes N] [query ...]
Writes scale_sweep_out.json and prints a markdown table for BENCH_HISTORY.md.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

import pyspark

os.environ.setdefault("SPARK_HOME", os.path.dirname(pyspark.__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SMALL = os.environ.get("SPARK_GRAFT_SWEEP_SMALL", "/root/testdata/sf0.1")
BIG = os.environ.get(
    "SPARK_GRAFT_SWEEP_BIG", os.path.join(REPO, ".localdata", "sf1")
)
FACTOR = float(os.environ.get("SPARK_GRAFT_SWEEP_FACTOR", "10"))

# The heavy tail: every operator whose 100 TB survival story SCALE.md argues
# from structure (bucketing, ceilings, incremental probes) rather than from
# a trivially linear plan.
DEFAULT_QUERIES = [
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_clusters",
    "dedup_minhash_incremental",
    "training_corpus_pipeline",
    "ann_ivf_topk",
    "ann_srp_topk",
    "embedding_near_dup_ivf",
    "kmeans_clusters",
    "kv_stream_final_state",
    "stream_sessions_gap_closed",
    "word_pagerank",
    "inverted_index",
    "wc",
]


def timed(fn, spark, sf_dir, passes):
    import gc

    best = math.inf
    rows = 0
    for _ in range(passes):
        t0 = time.monotonic()
        df = fn(spark, sf_dir)
        rows = len(df.collect())
        best = min(best, time.monotonic() - t0)
        spark.catalog.clearCache()
        df = None
        gc.collect()
    return round(best, 3), rows


def main() -> int:
    args = sys.argv[1:]
    passes = 2
    if args and args[0] == "--passes":
        passes = int(args[1])
        args = args[2:]
    names = args or DEFAULT_QUERIES

    from mapreduce_simple_go_spark.operators import all_queries
    from mapreduce_simple_go_spark.session import get_spark

    registry = all_queries()
    spark = get_spark(app_name="scale-sweep")
    # same warmup as bench.py: JVM + Python daemon outside the timed region
    spark.read.parquet(os.path.join(SMALL, "documents.parquet")).selectExpr(
        "sum(length(text))"
    ).collect()
    spark.range(32).mapInPandas(lambda it: it, schema="id long").collect()

    results = {}
    for name in names:
        fn = registry[name]
        t_small, n_small = timed(fn, spark, SMALL, passes)
        t_big, n_big = timed(fn, spark, BIG, passes)
        exp = round(math.log(t_big / t_small) / math.log(FACTOR), 2)
        results[name] = {
            "t_small": t_small,
            "t_big": t_big,
            "rows_small": n_small,
            "rows_big": n_big,
            "exponent": exp,
        }
        print(
            f"# {name}: {t_small}s -> {t_big}s  exp={exp} "
            f"rows {n_small}->{n_big}",
            file=sys.stderr,
            flush=True,
        )
    spark.stop()

    out = {
        "small": SMALL,
        "big": BIG,
        "factor": FACTOR,
        "passes": passes,
        "queries": results,
    }
    with open(os.path.join(REPO, "scale_sweep_out.json"), "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")

    print("| query | sf0.1 s | 10x s | rows 10x/1x | exponent |")
    print("|---|---|---|---|---|")
    for name, r in sorted(results.items(), key=lambda kv: -kv[1]["exponent"]):
        ratio = (
            round(r["rows_big"] / r["rows_small"], 1) if r["rows_small"] else "-"
        )
        print(
            f"| {name} | {r['t_small']} | {r['t_big']} | {ratio} "
            f"| {r['exponent']} |"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
