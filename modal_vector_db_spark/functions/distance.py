"""Vector distance as native Catalyst expressions.

The reference computes ``array_cosine_distance(embedding, ?::FLOAT[dim])``
inside DuckDB (``duckvdb.py:111``).  Spark has no cosine builtin, so we build
it from higher-order functions (``zip_with`` + ``aggregate``) — these stay
JVM-side inside whole-stage codegen, which at 100 TB is the difference between
a scan-rate-bound job and a Python-serialization-bound one.  A vectorized
pandas_udf alternative exists for very high dims where per-element codegen
becomes expression-tree heavy; for dim ≤ ~4k the native expression wins.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def vector_lit(vec: Sequence[float]) -> Column:
    """A literal query vector as an array<double> column."""
    return F.array(*[F.lit(float(v)) for v in vec])


def dot_product(a: Column, b: Column) -> Column:
    """Elementwise dot product of two array columns (computed in double)."""
    return F.aggregate(
        F.zip_with(a.cast("array<double>"), b.cast("array<double>"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a.cast("array<double>"), F.lit(0.0), lambda acc, x: acc + x * x
        )
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_distance(a: Column, b: Column) -> Column:
    """1 − cosine similarity — parity with DuckDB ``array_cosine_distance``
    (reference query template ``duckvdb.py:111``; oracle uses
    ``1 - list_cosine_similarity``)."""
    return F.lit(1.0) - cosine_similarity(a, b)


def l2_distance(a: Column, b: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.zip_with(
                a.cast("array<double>"), b.cast("array<double>"), lambda x, y: (x - y) * (x - y)
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
