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
    # --- round 10 window (r9 verdict #1): the two r6-overflow names first
    # (designated heads of this window since r9), then the full 47-entry
    # r7-stale block (computed by union over CORRECTNESS_r01..r09: after
    # this round no entry's last driver verdict predates r8), then the one
    # entry whose CODE changes this round. Exactly 50.
    "order_price_histogram",
    "supplier_balance_dist",
    # --- last driver-checked in round 7 (streaming-adjacent batch twins,
    # format roundtrips, curation, textstats, multimodal, the q-suite tail)
    "ann_srp_topk",
    "bm25_scores",
    "chunk_dedup",
    "curation_pipeline",
    "decontaminate_overlap",
    "dedup_incremental",
    "dedup_minhash_incremental",
    "dedup_simhash",
    "doc_fingerprint",
    "doc_split_assign",
    "embedding_quantize_error",
    "fuzzy_name_matches",
    "inverted_index_positional",
    "jsonl_roundtrip",
    "kmeans_clusters",
    "label_centroids",
    "lang_id",
    "length_bucket_batches",
    "multimodal_dedup",
    "multimodal_features",
    "multimodal_frame_features",
    "multimodal_resize",
    "ngram_counts",
    "orc_roundtrip",
    "pack_sequences",
    "pii_scrub",
    "q11_important_stock",
    "q12_ship_delay_priority",
    "q13_customer_order_distribution",
    "q15_top_supplier",
    "q16_supplier_part_count",
    "q20_part_promotion",
    "q21_waiting_suppliers",
    "q2_min_cost_supplier",
    "q8_market_share",
    "q9_product_type_profit",
    "quality_filter",
    "quality_model_score",
    "range_join_brackets",
    "repetition_filter",
    "sample_per_stratum",
    "stratified_sample",
    "text_quality",
    "tfidf_top_terms",
    "token_stats",
    "word_cooccurrence_pmi",
    "word_pagerank",
    # --- code changed this round (r10): the registry entry now runs the
    # size-gated exact two-stage form above the brute-force crossover
    # (r9 verdict #3); exact semantics, so the oracle is unchanged, but a
    # changed plan needs a fresh driver verdict per the window policy.
    "ann_cosine_topk",
]
assert len(_WINDOW_PRIORITY) <= 50, len(_WINDOW_PRIORITY)

# No staleness overflow this round: 2 (r6 heads) + 47 (r7 block) + 1
# (code-changed ann_cosine_topk) is exactly 50. The r11 window is the
# r8-stale block (49 names after this round's verdicts land).
_WINDOW_OVERFLOW: list[str] = []

# r10 code-changed entries EXEMPTED from the window under the capacity
# rule (all hold r8/r9 driver-green verdicts; all must be hash-green in
# the r10 four-SF self-sweeps at HEAD):
#   - events complete-mode size probe (r9 ADVICE): du_bytes
#     (ContentSummary, counts _SUCCESS/.crc) -> du_suffix_bytes
#     (*.parquet children only) in _events_stream/_drain_staged. Affects
#     the 7 _drain_staged stream entries below. Behavior-neutral: the
#     probe only picks the complete-mode SINK (memory vs parquet) and the
#     output is hash-identical either way (pinned in r9 by the driver-
#     green rows on both sides of the gate); the probe-value equivalence
#     (new probe == the original per-*.parquet stat sum, on both a plain
#     file and a Spark-written dir) is pinned by
#     tests/test_fsutil.py::test_du_suffix_bytes_matches_stat_sum.
#   - stream_user_totals_tws (r9 driver-green, was windowed r9): drain
#     shaved per r9 verdict #5 — semantics pinned by
#     test_tws_totals_converge_to_batch (hash vs the batch GROUP BY twin,
#     which IS the oracle SQL).
_WINDOW_EXEMPT_R10 = [
    "stream_sessions_gap_closed",
    "stream_hourly_counts",
    "stream_dedup_counts",
    "stream_enriched_counts",
    "stream_sliding_counts",
    "stream_click_purchase_join",
    "stream_session_window_native",
    "stream_user_totals_tws",
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
