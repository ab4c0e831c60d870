"""Operator registry: every module contributes QUERIES (name -> callable
taking (spark, sf_dir) and returning a DataFrame) and ORACLES (name -> DuckDB
SQL string with identical semantics and column names).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import (
    dedup,
    events,
    kv,
    multimodal,
    relational,
    sampling,
    similarity,
    text,
    textstats,
)


def _modules():
    # strict imports: a broken module must fail loudly here, not silently
    # drop its queries from the registry the driver's gate checks.
    #
    # Order matters: the driver's correctness harness checks the first 50
    # registry entries in iteration order. Modules whose queries have never
    # received a driver verdict go first (events, multimodal, sampling,
    # textstats — 22 queries); the twice-verified relational block rotates
    # to the tail, where its overflow past position 50 costs nothing.
    return [events, multimodal, sampling, textstats, text, kv, dedup, similarity, relational]


# Names hoisted to the very front of the registry regardless of module order.
# Policy (per round-3 ADVICE): the window holds (a) any name without a green
# driver CORRECTNESS row, and (b) any operator whose code changed in the
# current round — a self-sweep is not an independent verdict. Names rotate
# out only once a green row exists for the code at HEAD.
_WINDOW_PRIORITY = [
    # round-4 fixes for the two r3 hash mismatches (int64/float64 dtype split)
    "events_props_json",
    "user_event_pivot",
    # rewritten in round 3, never inside a driver window since the rewrite
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "ann_ivf_topk",
    "embedding_near_dup_ivf",
    # rewritten in round 4 (stateful-fold versioning; see kv.py)
    "kv_stream_final_state",
    # new in round 4
    "kmeans_clusters",
    "pii_scrub",
    "jsonl_roundtrip",
    "orc_roundtrip",
    "word_pagerank",
    "multimodal_dedup",
    "quality_model_score",
    "length_bucket_batches",
    "embedding_quantize_error",
    "stream_sessions_gap_closed",
    "label_centroids",
    "dedup_minhash_incremental",
    "range_join_brackets",
    "bm25_scores",
    "events_rollup_multigrain",
]


def _prioritize(out: dict) -> dict:
    head = {k: out[k] for k in _WINDOW_PRIORITY if k in out}
    head.update(out)
    return head


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for m in _modules():
        out.update(getattr(m, "QUERIES", {}))
    return _prioritize(out)


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _modules():
        out.update(getattr(m, "ORACLES", {}))
    return _prioritize(out)
