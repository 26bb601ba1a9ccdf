"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship exact-KNN query at sf0.001;
``queries()``/``oracle_sql()`` expose the full operator inventory of
SURVEY.md §2 (plus the scale-out pipeline extensions) for the DuckDB
correctness harness.  Implementation lives in ``modal_vector_db_spark``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from modal_vector_db_spark.harness import QUERIES

    return QUERIES["knn_topk"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from modal_vector_db_spark.harness import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from modal_vector_db_spark.harness import ORACLES

    return dict(ORACLES)
