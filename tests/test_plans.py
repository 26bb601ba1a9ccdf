"""Physical-plan quality gates — the scale contract (SURVEY §4.2).

A query that silently de-optimizes (pushdown blocked, fact-table shuffle
reintroduced, top-k becoming a global sort) would still pass correctness;
these tests pin the plan shape that survives 100 TB.
"""

from __future__ import annotations

import modal_vector_db_spark.queries.relational_queries as R
import modal_vector_db_spark.queries.vector_queries as V
from modal_vector_db_spark.plans import (
    broadcast_join_count,
    has_pushed_data_filters,
    scan_columns,
    sort_merge_join_count,
    uses_take_ordered,
)
from tests.conftest import SF_DIR


def test_knn_is_takeordered_not_global_sort(spark):
    """ORDER BY distance LIMIT k must plan as a bounded-heap top-k."""
    df = V.knn_exact(spark, SF_DIR)
    assert uses_take_ordered(df)


def test_knn_scan_prunes_columns(spark):
    """KNN must read only (vec_id, embedding) — not label."""
    df = V.knn_exact(spark, SF_DIR)
    cols = scan_columns(df)
    assert cols, "no parquet scan found"
    assert all(set(c) <= {"vec_id", "embedding"} for c in cols), cols


def test_filtered_knn_pushes_predicate(spark):
    df = V.knn_filtered(spark, SF_DIR)
    assert has_pushed_data_filters(df)


def test_q6_pushdown_and_pruning(spark):
    df = R.q6_revenue_forecast(spark, SF_DIR)
    assert has_pushed_data_filters(df)
    cols = scan_columns(df)
    assert all(
        set(c) <= {"l_quantity", "l_extendedprice", "l_discount", "l_shipdate"} for c in cols
    ), cols


def test_q3_broadcasts_dims_no_fact_shuffle_join(spark):
    """The lineitem fact must join via broadcast, not sort-merge."""
    df = R.q3_shipping_priority(spark, SF_DIR)
    assert broadcast_join_count(df) >= 2
    assert sort_merge_join_count(df) == 0


def test_q5_star_join_all_broadcast(spark):
    df = R.q5_local_supplier_volume(spark, SF_DIR)
    assert broadcast_join_count(df) >= 4
    assert sort_merge_join_count(df) == 0


def test_scale_out_preserves_pushdown_and_pruning(spark):
    """The small-file repartition must not block scan-level optimization."""
    from pyspark.sql import functions as F

    from modal_vector_db_spark.harness import load, scale_out

    df = scale_out(load(spark, SF_DIR, "embeddings")).filter(F.col("label") == 3).select("vec_id")
    assert has_pushed_data_filters(df)
    cols = scan_columns(df)
    assert cols and all(set(c) <= {"vec_id", "label"} for c in cols), cols
