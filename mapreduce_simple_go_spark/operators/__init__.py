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
    # --- round 7: final rotation round. Exactly the 50 entries whose most
    # recent green driver verdict predates round 5 (16 last-checked r3 +
    # 34 last-checked r4, computed by union over CORRECTNESS_r01..r06).
    # Zero new registry entries this round by design; once these 50 come
    # back green, every registry entry's driver verdict is <= 2 rounds old.
    # --- last driver-checked in round 3
    "inverted_index_positional",
    "chunk_dedup",
    "dedup_incremental",
    "fuzzy_name_matches",
    "decontaminate_overlap",
    "ann_srp_topk",
    "q2_min_cost_supplier",
    "q8_market_share",
    "q9_product_type_profit",
    "q11_important_stock",
    "q12_ship_delay_priority",
    "q13_customer_order_distribution",
    "q15_top_supplier",
    "q16_supplier_part_count",
    "q20_part_promotion",
    "q21_waiting_suppliers",
    # --- last driver-checked in round 4
    "wc",
    "jsonl_roundtrip",
    "orc_roundtrip",
    "doc_split_assign",
    "doc_fingerprint",
    "ngram_counts",
    "token_stats",
    "lang_id",
    "text_quality",
    "quality_filter",
    "quality_model_score",
    "repetition_filter",
    "pii_scrub",
    "tfidf_top_terms",
    "bm25_scores",
    "word_cooccurrence_pmi",
    "word_pagerank",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "dedup_minhash_incremental",
    "embedding_near_dup_ivf",
    "embedding_quantize_error",
    "kmeans_clusters",
    "label_centroids",
    "multimodal_features",
    "multimodal_resize",
    "multimodal_frame_features",
    "multimodal_dedup",
    "stratified_sample",
    "sample_per_stratum",
    "length_bucket_batches",
    "pack_sequences",
    "curation_pipeline",
    "range_join_brackets",
]

# stream_user_totals_tws registers only where a google.protobuf runtime is
# importable (events.register_tws / _protobuf.ensure_protobuf). When it IS
# registered it has never had a green driver row, so per the window policy
# it must sit inside the 50-name head; "wc" yields its slot because the
# driver's entry() smoke check runs the same word_count code path every
# round regardless (it keeps its r4 green row and the HEAD self-sweeps).
if "stream_user_totals_tws" in events.QUERIES:
    _WINDOW_PRIORITY = [
        "stream_user_totals_tws",
        *[n for n in _WINDOW_PRIORITY if n != "wc"],
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
