"""Operator registry: every module contributes QUERIES (name -> callable
taking (spark, sf_dir) and returning a DataFrame) and ORACLES (name -> DuckDB
SQL string with identical semantics and column names).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import kv, relational, text


def _modules():
    mods = [text, relational, kv]
    for name in ("dedup", "similarity", "textstats", "events", "multimodal"):
        try:
            mods.append(__import__(f"{__name__}.{name}", fromlist=[name]))
        except ImportError:
            pass
    return mods


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for m in _modules():
        out.update(getattr(m, "QUERIES", {}))
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _modules():
        out.update(getattr(m, "ORACLES", {}))
    return out
