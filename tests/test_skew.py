"""AQE skew handling: a join with a hot key must be split at runtime
(SortMergeJoin(skew=true)) instead of drowning one reducer — the mechanism
that replaces manual salting for joins at 100 TB."""

from __future__ import annotations

from pyspark.sql import functions as F

from modal_vector_db_spark.plans.inspect import executed_plan


def test_aqe_splits_skewed_join(spark):
    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        # 80% of left rows share key 0 — one shuffle partition would get
        # ~4x the advisory size without the AQE split.
        left = spark.range(200000).select(
            F.when(F.col("id") % 5 != 0, 0).otherwise(F.col("id")).alias("k"),
            F.rand(1).alias("x"),
        )
        right = spark.range(50000).select(F.col("id").alias("k"), F.rand(2).alias("y"))
        j = left.join(right, "k").select(F.sum("x").alias("s"))
        j.collect()
        assert "skew=true" in executed_plan(j)
    finally:
        for k, v in saved.items():
            if v is not None:
                spark.conf.set(k, v)
