"""Partitioned parquet sink + partition-pruned reads.

At 100 TB the date-partitioned layout is what turns "scan everything" into
"scan one day". This pins: (a) hive-style partition layout on disk, (b)
PartitionFilters (not data filters) pruning at read time.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from mapreduce_simple_go_spark.plans import formatted_plan

from .conftest import SF_DIR


def test_partitioned_write_and_pruned_read(spark, tmp_path):
    out = str(tmp_path / "orders_by_month")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").withColumn(
        "month", F.date_format("o_orderdate", "yyyy-MM")
    )
    orders.write.partitionBy("month").mode("overwrite").parquet(out)

    dirs = [d for d in os.listdir(out) if d.startswith("month=")]
    assert len(dirs) > 1, "expected hive-style month= partition directories"

    back = spark.read.parquet(out)
    one_month = sorted(d.split("=", 1)[1] for d in dirs)[0]
    q = back.filter(F.col("month") == one_month)
    plan = formatted_plan(q)
    assert "PartitionFilters" in plan and "month" in plan.split("PartitionFilters", 1)[1][:200]
    # pruning correctness: row count equals the per-partition count
    expected = orders.filter(F.col("month") == one_month).count()
    assert q.count() == expected
