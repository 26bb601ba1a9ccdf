"""Approximate aggregates — the 100 TB path for distinct counts and
quantiles (exact variants are oracle-checked in relational queries; the
approximate ones are bounded-error, so they get tolerance tests vs exact)."""

from __future__ import annotations

from pyspark.sql import functions as F

from modal_vector_db_spark.harness import load
from tests.conftest import SF_DIR


def test_hll_distinct_within_5pct(spark):
    li = load(spark, SF_DIR, "lineitem")
    row = li.agg(
        F.countDistinct("l_partkey").alias("exact"),
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx"),
    ).head()
    assert abs(row["approx"] - row["exact"]) / row["exact"] < 0.05


def test_approx_percentile_close_to_exact(spark):
    o = load(spark, SF_DIR, "orders")
    row = o.agg(
        F.percentile("o_totalprice", F.lit(0.5)).alias("exact_med"),
        F.percentile_approx("o_totalprice", F.lit(0.5), F.lit(10000)).alias("approx_med"),
    ).head()
    # percentile_approx error is bounded by rank accuracy; at 10k it lands
    # within a fraction of a percent of the exact interpolated median here
    assert abs(row["approx_med"] - row["exact_med"]) / row["exact_med"] < 0.01
