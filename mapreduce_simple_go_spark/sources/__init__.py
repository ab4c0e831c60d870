"""Source connectors.

The reference's only source is the whole-file text scan
(/root/reference/src/mr/worker.go:71-81); :func:`whole_text_files` reproduces
it. The parquet fixture loaders normalize physical-type quirks (nanosecond
timestamps) so downstream operators always see proper TimestampType.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType


def whole_text_files(spark: SparkSession, path_glob: str) -> DataFrame:
    """(filename, contents) rows — the reference's map-task input contract.

    Uses the wholeTextFiles RDD source (one record per file, file-level
    parallelism = the reference's M = number of input files).
    """
    rdd = spark.sparkContext.wholeTextFiles(path_glob)
    return spark.createDataFrame(rdd, schema="filename string, contents string")


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events table with ``ts`` normalized to TimestampType.

    The fixture writes TIMESTAMP(NANOS); with nanosAsLong the column arrives
    as long nanoseconds. Integer division (``div``) truncates to microseconds
    exactly like readers that downcast ns->us (e.g. DuckDB). Float division
    would be wrong: epoch-nanos exceed double's 2^53 integer range.
    """
    # Self-contained under ANY session: the fixture's physical type
    # TIMESTAMP(NANOS) is rejected by a vanilla reader, so the legacy
    # nanos-as-long conf must be on for this read. It is runtime-settable,
    # so set it here rather than relying on session construction
    # (session.get_spark also sets it, but callers may hand us a plain
    # SparkSession -- e.g. the external correctness harness).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    if isinstance(ev.schema["ts"].dataType, LongType):
        ev = ev.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return ev
