"""Measure IVF recall@k against the exact brute-force baseline.

For each probe width: recall@TOP_K = mean over queries of
|IVF top-k ∩ exact top-k| / k. The exact set is ann_cosine_topk (brute
scan); ties are broken identically in both paths (cosine DESC, vec_id
ASC), so recall is deterministic. Prints a markdown table for SCALE.md.

Usage: python scripts/ann_recall.py [fixture_dir ...]
       (default: /root/testdata/sf0.001 /root/testdata/sf0.01)
"""

from __future__ import annotations

import os
import sys
from collections import defaultdict

import pyspark

os.environ.setdefault("SPARK_HOME", os.path.dirname(pyspark.__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mapreduce_simple_go_spark.operators.similarity import (  # noqa: E402
    TOP_K,
    ann_cosine_topk,
    ann_ivf_topk,
)
from mapreduce_simple_go_spark.session import get_spark  # noqa: E402

NPROBES = [1, 2, 3, 6, 12]


def topk_sets(df) -> dict[int, set[int]]:
    out = defaultdict(set)
    for r in df.collect():
        out[r.query_id].add(r.vec_id)
    return out


def recall(spark, sf_dir: str, nprobe: int, exact: dict[int, set[int]]) -> float:
    approx = topk_sets(ann_ivf_topk(spark, sf_dir, nprobe=nprobe))
    num = sum(len(approx.get(q, set()) & hits) for q, hits in exact.items())
    # denominator = actual exact-hit count, not len(exact)*TOP_K: a query
    # whose exact top-k has fewer than TOP_K rows (tiny tables) would
    # otherwise bias recall low even on a perfect match
    denom = sum(len(hits) for hits in exact.values())
    if denom == 0:
        raise SystemExit(f"no queries/hits in fixture (nprobe={nprobe}); "
                         "embeddings table is empty or has no query rows")
    return num / denom


def main() -> None:
    dirs = sys.argv[1:] or ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
    spark = get_spark(shuffle_partitions=16)
    print("| fixture | n_queries | " + " | ".join(f"nprobe={p}" for p in NPROBES) + " |")
    print("|---|---|" + "---|" * len(NPROBES))
    for d in dirs:
        exact = topk_sets(ann_cosine_topk(spark, d))
        cells = [f"{recall(spark, d, p, exact):.3f}" for p in NPROBES]
        print(f"| {os.path.basename(d.rstrip('/'))} | {len(exact)} | " + " | ".join(cells) + " |")
    spark.stop()


if __name__ == "__main__":
    main()
