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
    # new in round 5 — no driver verdict yet
    "session_window_native",
    "stream_session_window_native",
    "stream_click_purchase_join",
    "anomaly_zscore",
    "ewma_user_value",
    "line_dedup_rewrite",
    "domain_mix_weights",
    "data_profile_orders",
    "pareto_orders",
    "dedup_clusters_distributed",
    "inverted_index_capped",
    "per_file_metrics_chunked",
    "stream_hourly_counts",
    "csv_roundtrip",
    "stream_dedup_counts",
    "schema_evolution_roundtrip",
    "heavy_hitters_cms",
    "bigram_lm",
    "scd2_user_state",
    "bloom_decontaminate",
    "word_triangles",
    "stream_enriched_counts",
    "join_key_skew",
    "dedup_keep_best",
    "props_variant_histogram",
    "events_hourly_gapfill",
    "events_metrics_unpivot",
    "lsh_band_occupancy",
    "partitioned_prune_roundtrip",
    "global_rank_orders",
    "stream_sliding_counts",
    "weighted_sample_docs",
    "lm_perplexity_filter",
    # code changed in round 5 (multi-file drain param; uuid view hygiene)
    "kv_stream_final_state",
    "events_rollup_multigrain",
    # every query that loads events goes through sources.load_events /
    # streaming.stream_events, whose timestamp normalization changed in
    # round 5 (session TZ pinned to UTC) — re-verify the whole family
    "events_hourly",
    "sessionization",
    "top_event_values",
    "events_sliding",
    "events_props_json",
    "user_event_pivot",
    "purchase_within_hour_of_click",
    "funnel_signup_click_purchase",
    "retention_cohorts",
    "stream_sessions_gap_closed",
    "asof_last_purchase",
    "event_value_delta",
    "kv_get_visible",
    "kv_final_state",
    "kv_final_state_dedup",
    # kv_shard_distribution is deliberately NOT here (window capacity is 50
    # and this list must fit): its inputs are event_id/user_id/event_type
    # only — kv_ops never consumes ts, so the round-5 timestamp
    # normalization change cannot affect it, and it holds green driver rows
    # from earlier rounds for unchanged code.
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
