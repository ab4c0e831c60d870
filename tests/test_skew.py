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


def test_aqe_splits_skewed_join_partition(spark):
    """SCALE.md's global posture claims AQE skew-join splitting as the
    built-in mitigation; pin that it actually ENGAGES: with thresholds
    scaled to fixture size and broadcast disabled (to force a shuffle
    join), the executed plan must mark the hot partition skewed and the
    join output must still be exact."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        left, right = _skewed_pair(spark)
        # fatten the hot rows so the skewed partition crosses the byte bar
        left = left.select("k", F.concat_ws("", *[F.lpad("payload", 20, "x")] * 10).alias("payload"))
        joined = left.join(right, "k")
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skewed=" in plan or "isSkew" in plan or "skew=true" in plan, plan[:2000]
        assert joined.count() == 20000
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
