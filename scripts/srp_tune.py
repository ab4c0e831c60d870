"""Measure the SRP-LSH cost/recall frontier to size the band layout.

For each (bands, bits-per-band) config this sweeps, computes on a real
fixture: mean candidates per query (the Spark-side cost driver — exact
scoring + dedup shuffle are linear in it), mean recall@TOP_K against the
exact brute-force top-k, and wall time of the full ann_srp_topk query.
The shipped SRP_BANDS/SRP_BITS are chosen from this table (SCALE.md r7
SRP section keeps the results): 4x4 bands collide on 1/16 of a uniform
corpus per band — candidates ~ n/4 per query, which is only a 4x prune
over brute force and therefore still quadratic when the query set scales
with the corpus (vec_id % QUERY_MOD). Wider bands cut candidates
geometrically while recall falls only linearly in band count.

Usage: python scripts/srp_tune.py [sf_dir ...] (default testdata sf0.001/sf0.01/sf0.1)
"""

from __future__ import annotations

import json
import os
import sys
import time

import pyspark

os.environ.setdefault("SPARK_HOME", os.path.dirname(pyspark.__file__))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.functions import broadcast  # noqa: E402

from mapreduce_simple_go_spark.operators import similarity as S  # noqa: E402
from mapreduce_simple_go_spark.session import get_spark  # noqa: E402

CONFIGS = [(4, 4), (4, 6), (6, 5), (6, 6), (8, 6), (8, 8), (12, 8), (16, 8)]


def _set_config(bands: int, bits: int) -> None:
    S.SRP_BANDS = bands
    S.SRP_BITS = bands * bits
    S._SRP_ROWS_PER_BAND = bits


def _candidates_per_query(spark, sf_dir: str) -> float:
    """Mean deduped candidate count per query under the CURRENT config —
    the same cand subplan ann_srp_topk scores, counted instead."""
    base = S._emb(spark, sf_dir)
    sigs = S._srp_signatures(base).select(
        "vec_id", F.posexplode(F.col("bands")).alias("band_idx", "band_val")
    )
    q_sigs = S._srp_signatures(
        base.filter(F.col("vec_id") % S.QUERY_MOD == 0)
    ).select(
        F.col("vec_id").alias("query_id"),
        F.posexplode(F.col("bands")).alias("q_band_idx", "q_band_val"),
    )
    cand = (
        sigs.join(
            broadcast(q_sigs),
            (F.col("band_idx") == F.col("q_band_idx"))
            & (F.col("band_val") == F.col("q_band_val"))
            & (F.col("vec_id") != F.col("query_id")),
        )
        .select("query_id", "vec_id")
        .distinct()
    )
    # denominator = TOTAL query count, not countDistinct over the candidate
    # set: queries with zero candidates must still dilute the mean, else
    # cand/query is overstated (and prune_vs_brute understated) exactly for
    # the wide-band configs where empty candidate sets are common.
    n_queries = base.filter(F.col("vec_id") % S.QUERY_MOD == 0).count()
    pairs = cand.count()
    return pairs / max(n_queries, 1)


def main() -> int:
    dirs = sys.argv[1:] or [
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    ]
    spark = get_spark(app_name="srp-tune")
    orig = (S.SRP_BANDS, S._SRP_ROWS_PER_BAND)
    out = []
    for sf_dir in dirs:
        n = S._emb(spark, sf_dir).count()
        exact = {}
        for r in S.ann_cosine_topk(spark, sf_dir).collect():
            exact.setdefault(r.query_id, set()).add(r.vec_id)
        for bands, bits in CONFIGS:
            _set_config(bands, bits)
            t0 = time.time()
            rows = S.ann_srp_topk(spark, sf_dir).collect()
            dt = round(time.time() - t0, 2)
            got = {}
            for r in rows:
                got.setdefault(r.query_id, set()).add(r.vec_id)
            recalls = [
                len(got.get(q, set()) & hits) / len(hits) for q, hits in exact.items()
            ]
            rec = round(sum(recalls) / len(recalls), 3) if recalls else None
            cand = round(_candidates_per_query(spark, sf_dir), 1)
            out.append(
                {
                    "sf_dir": sf_dir,
                    "n": n,
                    "bands": bands,
                    "bits": bits,
                    "cand_per_query": cand,
                    "prune_vs_brute": round(n / cand, 1) if cand else None,
                    "recall_at_k": rec,
                    "query_s": dt,
                }
            )
            print(json.dumps(out[-1]), flush=True)
    _set_config(*orig)
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
