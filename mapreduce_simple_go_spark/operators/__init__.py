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
#
# r9 amendment (capacity rule): when (a) + (b) + the scheduled staleness
# rotation exceed the 50-slot window, changed entries may be EXEMPTED from
# re-windowing only if ALL of: (1) they hold a green driver verdict from the
# previous two rounds, (2) the change's driver-SF behavior is pinned
# identical by a dedicated test (not just a self-sweep), and (3) they are
# hash-green in this round's four-SF self-sweeps at HEAD. Exempted names
# and their evidence are listed below; anything failing a criterion must
# take a slot. Overflow from the staleness rotation goes to
# _WINDOW_OVERFLOW (positions 51+, the head of the NEXT round's window).
_WINDOW_PRIORITY = [
    # --- round 12 window (r11 verdict #4): the full 48-entry r9-stale block
    # (union over CORRECTNESS_r01..r11: staleness after r11 is
    # {r11: 50, r10: 50, r9: 48}; after this round no entry's last driver
    # verdict predates r10). 48 names + 2 slots for this round's
    # code-changed entries. Exactly 50.
    "ann_ivf_topk_multiprobe",
    "count_per_key",
    "cube_order_stats",
    "customer_balance_quartiles",
    "customers_never_ordered",
    "data_profile_orders",
    "dedup_clusters",
    "dedup_clusters_distributed",
    "dedup_exact",
    "dedup_keep_best",
    "dedup_minhash_lsh",
    "dedup_minhash_lsh_salted",
    "distinct_parts_per_supplier",
    "doc_chunks",
    "embedding_near_dup",
    "embedding_near_dup_ivf",
    "embedding_norm_stats",
    "grouping_sets_revenue",
    "inverted_index",
    "kv_shard_distribution",
    "median_order_by_segment",
    "multimodal_audio_stats",
    "multimodal_audio_wav",
    "parts_above_brand_avg",
    "per_file_metrics",
    "q10_returned_items",
    "q14_promo_revenue",
    "q17_small_quantity_revenue",
    "q18_large_volume_customers",
    "q19_bracket_revenue",
    "q1_pricing_summary",
    "q22_global_sales_opportunity",
    "q3_bucketed_ingest",
    "q3_shipping_priority",
    "q4_order_priority",
    "q5_supplier_volume",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "revenue_by_month",
    "rolling_7day_revenue",
    "rollup_order_revenue",
    "salted_segment_revenue",
    "set_ops_customers",
    "sketch_distinct_accuracy",
    "sketch_percentile_accuracy",
    "stream_user_totals_tws",
    "top_customers_per_nation",
    "training_corpus_pipeline",
    # --- code changed this round (r12), taking the 2 remaining slots:
    # q11_important_stock (plan change: cached per_part + scalar total —
    # one lineitem scan instead of two) and ann_srp_topk (the sf100
    # spot-check exposed its wide pair shuffle; pairs are now scored
    # map-side and deduped NARROW — the riskiest semantic change of the
    # round, so it takes a slot). The round's OTHER plan-changed entries
    # (dedup_clusters / dedup_clusters_distributed / dedup_keep_best, via
    # the connected-components driver-tier probe) are r9-stale and already
    # hold slots above.
    "q11_important_stock",
    "ann_srp_topk",
]
assert len(_WINDOW_PRIORITY) <= 50, len(_WINDOW_PRIORITY)

# No staleness overflow this round: 48 (r9 block) + 2 (code-changed) is
# exactly 50. The r13 window is the r10-stale block (the r10 window's 50
# names minus any re-verified sooner).
_WINDOW_OVERFLOW: list[str] = []

# r12 code-changed entries EXEMPTED from the window under the capacity
# rule (each holds an r11 driver-green verdict; each must be hash-green in
# the r12 four-SF self-sweeps at HEAD; every one is covered by
# tests/test_oracle_parity.py at driver SF):
#   - stream_hourly_counts, stream_enriched_counts, stream_sliding_counts
#     (all r11 driver-green): width-only change — they now pass
#     shuffle_partitions=8 through _drain_staged's EXISTING 32 MB
#     input-size gate, the identical mechanism stream_session_window_native
#     and kv_stream_final_state already exercised under driver verdicts;
#     output semantics are width-independent (hash-pinned by the oracle
#     parity suite at driver SF and the r12 self-sweeps).
_WINDOW_EXEMPT_R12 = [
    "stream_hourly_counts",
    "stream_enriched_counts",
    "stream_sliding_counts",
]


def _prioritize(out: dict) -> dict:
    head = {k: out[k] for k in _WINDOW_PRIORITY if k in out}
    for k in _WINDOW_OVERFLOW:
        if k in out:
            head.setdefault(k, out[k])
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
