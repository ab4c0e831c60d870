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
    # --- round 9 window: the two forced insertions first, then the 48-of-50
    # r6-stale block (events/relational/dedup/similarity families — computed
    # by union over CORRECTNESS_r01..r08; after this round no entry's
    # verdict predates r7 except the two overflow names below).
    #
    # Forced insertion 1 (r8 ADVICE): stream_user_totals_tws's worker-side
    # zip handling changed in r8 WITHOUT re-windowing — a policy violation
    # the ADVICE flagged. Its staging also changed this round (fsutil).
    "stream_user_totals_tws",
    # Forced insertion 2 (r8 ADVICE): the r8 IS-NOT-DISTINCT-FROM edit to
    # duck_assign_ctes changed this entry's ORACLE without a fresh driver
    # verdict. The other three dependents (ann_ivf_topk,
    # ann_ivf_topk_multiprobe, embedding_near_dup) sit in the r6 block
    # below and get their fresh verdicts through the normal rotation.
    "embedding_near_dup_ivf",
    # --- last driver-checked in round 6
    "inverted_index",
    "per_file_metrics",
    "count_per_key",
    "doc_chunks",
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
    "rolling_7day_revenue",
    "dedup_exact",
    "dedup_minhash_lsh",
    "ann_cosine_topk",
    "ann_ivf_topk",
    "embedding_near_dup",
    "q7_volume_shipping",
    "q10_returned_items",
    "q14_promo_revenue",
    "q19_bracket_revenue",
    "grouping_sets_revenue",
    "sketch_distinct_accuracy",
    "q17_small_quantity_revenue",
    "q18_large_volume_customers",
    "q22_global_sales_opportunity",
    "salted_segment_revenue",
    "sketch_percentile_accuracy",
    "kv_shard_distribution",
    "dedup_clusters",
    "embedding_norm_stats",
    "multimodal_audio_stats",
    "training_corpus_pipeline",
    "data_profile_orders",
    "dedup_clusters_distributed",
    "dedup_keep_best",
    "dedup_minhash_lsh_salted",
    "ann_ivf_topk_multiprobe",
    "q3_bucketed_ingest",
    "multimodal_audio_wav",
]
assert len(_WINDOW_PRIORITY) <= 50, len(_WINDOW_PRIORITY)

# The two r6-block entries displaced by the forced insertions (positions
# 51-52 — immediately after the window, and the HEAD of the r10 window).
# Chosen as the lowest-risk roll-overs in the block: single-table
# aggregations with unchanged code since their r6 verdict and dedicated
# pytest oracle-parity coverage every round.
_WINDOW_OVERFLOW = [
    "order_price_histogram",
    "supplier_balance_dist",
]

# r9 code-changed entries EXEMPTED from the window under the capacity rule
# (all r7/r8 driver-green; all hash-green in the r9 four-SF self-sweeps):
#   - FS-agnostic staging rework (events/kv/streaming + fsutil): the change
#     is pinned behavior-identical by tests/test_fsutil.py, which hashes
#     each staging family end-to-end under file:-URI fixtures against the
#     plain-path run (stream_hourly_counts, stream_dedup_counts,
#     stream_enriched_counts, stream_sliding_counts,
#     stream_click_purchase_join, stream_session_window_native,
#     stream_sessions_gap_closed, kv_stream_final_state — all r8-green).
#   - dedup_ngram_jaccard (r8-green): only the size PROBE changed
#     (os.stat -> Hadoop ContentSummary); tests/test_fsutil.py pins the
#     probe value equal at driver SF, so the join-strategy branch and plan
#     are unchanged (also pinned by test_ngram_jaccard_join_strategy_gate).
#   - format-roundtrip entries (csv/jsonl/orc/schema_evolution/
#     partitioned_prune — r7/r8-green): scratch dir swapped from
#     tempfile.mkdtemp to fsutil.mkscratch, whose no-env default IS
#     tempfile.mkdtemp (identical driver-SF path by construction);
#     URI-scratch parity pinned by
#     test_roundtrip_sinks_honor_uri_scratch_root.
_WINDOW_EXEMPT_R9 = [
    "stream_hourly_counts",
    "stream_dedup_counts",
    "stream_enriched_counts",
    "stream_sliding_counts",
    "stream_click_purchase_join",
    "stream_session_window_native",
    "stream_sessions_gap_closed",
    "kv_stream_final_state",
    "dedup_ngram_jaccard",
    "csv_roundtrip",
    "jsonl_roundtrip",
    "orc_roundtrip",
    "schema_evolution_roundtrip",
    "partitioned_prune_roundtrip",
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
