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
# These are queries added after their module's block already overflowed the
# driver's 50-entry check window (the round-3 relational additions); hoisting
# displaces twice-verified names, never unverified ones. Remove entries once
# they have a green CORRECTNESS row.
_WINDOW_PRIORITY = [
    "q8_market_share",
    "q12_ship_delay_priority",
    "q13_customer_order_distribution",
    "q15_top_supplier",
    "q21_waiting_suppliers",
    "q2_min_cost_supplier",
    "q9_product_type_profit",
    "q11_important_stock",
    "q16_supplier_part_count",
    "q20_part_promotion",
    "dedup_incremental",
    "fuzzy_name_matches",
    "repetition_filter",
    "decontaminate_overlap",
    "pack_sequences",
    "kv_stream_final_state",
    "ann_srp_topk",
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
