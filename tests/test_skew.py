"""Skew handling: salted joins must be plan-different but result-identical."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_simple_go_spark.functions import salted_join


def _skewed_pair(spark):
    # 95% of left rows share one key — the classic hot-key profile
    left = spark.range(0, 20000).select(
        F.when(F.col("id") % 20 != 0, F.lit(7)).otherwise(F.col("id") % 50).alias("k"),
        F.col("id").alias("payload"),
    )
    right = spark.range(0, 50).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("dim")
    )
    return left, right


def test_salted_join_matches_plain_join(spark):
    left, right = _skewed_pair(spark)
    plain = left.join(right, "k").groupBy("k").agg(
        F.count("*").alias("n"), F.sum("dim").alias("s")
    )
    salted = salted_join(left, right, "k", n_salt=8).groupBy("k").agg(
        F.count("*").alias("n"), F.sum("dim").alias("s")
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_spreads_hot_key(spark):
    left, right = _skewed_pair(spark)
    joined = salted_join(left, right, "k", n_salt=8)
    # hot key k=7 must appear in multiple shuffle partitions pre-aggregation
    parts = (
        joined.filter(F.col("k") == 7)
        .select(F.spark_partition_id().alias("p"))
        .distinct()
        .count()
    )
    assert parts > 1, "salting failed to spread the hot key"
