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
    # --- new or code-changed in round 6 — need a driver verdict at HEAD
    "dedup_minhash_lsh_salted",     # new: occupancy-capped LSH
    "ann_ivf_topk",                 # changed: nprobe parameter added
    "ann_ivf_topk_multiprobe",      # new: wide-probe point
    "q3_bucketed_ingest",           # new: bucket-ingested fact join
    "multimodal_audio_wav",         # new: real WAV codec path
    "multimodal_audio_stats",       # changed: refactored onto _audio_stats_over
    "data_profile_orders",          # changed: empty-table null-count coalesce
    # dedup_minhash_lsh's pair-scoring tail was factored into
    # _lsh_pair_scores (shared with the salted form; oracle SQL strings
    # verified byte-identical pre/post) — it and every entry composing it
    # re-enter per the changed-code policy
    "dedup_minhash_lsh",
    "dedup_clusters_distributed",
    "dedup_keep_best",
    "training_corpus_pipeline",
    # --- stalest standing verdicts: the whole last-green-in-round-2 block
    # (unchanged code, green r5 self-sweeps at sf0.01/sf0.1/sf1; rotating
    # them in refreshes the independent driver evidence)
    "kv_shard_distribution",
    "dedup_exact",
    "dedup_clusters",
    "ann_cosine_topk",
    "embedding_near_dup",
    "embedding_norm_stats",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_supplier_volume",
    "q4_order_priority",
    "top_customers_per_nation",
    "revenue_by_month",
    "q6_forecast_revenue",
    "rollup_order_revenue",
    "set_ops_customers",
    "distinct_parts_per_supplier",
    "cube_order_stats",
    "median_order_by_segment",
    "customers_never_ordered",
    "parts_above_brand_avg",
    "customer_balance_quartiles",
    "order_price_histogram",
    "rolling_7day_revenue",
    "q7_volume_shipping",
    "q10_returned_items",
    "q14_promo_revenue",
    "q19_bracket_revenue",
    "supplier_balance_dist",
    "grouping_sets_revenue",
    "sketch_distinct_accuracy",
    "q17_small_quantity_revenue",
    "q18_large_volume_customers",
    "q22_global_sales_opportunity",
    "salted_segment_revenue",
    "sketch_percentile_accuracy",
    # --- oldest of the last-green-in-round-3 block (remaining r3 + the r4
    # block rotate in next round; every name above/below retains its prior
    # green driver row either way)
    "inverted_index",
    "per_file_metrics",
    "count_per_key",
    "doc_chunks",
]
assert len(_WINDOW_PRIORITY) <= 50, len(_WINDOW_PRIORITY)


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
