"""Sketch-based estimators — the "measure before you shuffle" toolkit.

At 100 TB you cannot afford an exact COUNT(DISTINCT) or a full sort to make
layout decisions (how many shuffle partitions? is this key skewed? what
fraction of the corpus is duplicated?).  Spark ships mergeable one-pass
sketches for exactly this; these wrappers pin the idioms and their error
contracts so pipelines use the cheap path by default:

- HyperLogLog++ (``approx_count_distinct``) for cardinality / duplication
  rate: one scan, map-side partial sketches merged at the driver, relative
  standard deviation configurable.
- Greenwald-Khanna (``percentile_approx``) for quantiles: mergeable, rank
  error bounded by ``1/accuracy`` — usable per-group inside a single
  aggregation pass (unlike an exact median, which needs a full sort).
- FP-growth-style ``freqItems`` for heavy hitters (support threshold, false
  positives possible, false negatives not) — the skew detector used before
  choosing a salting strategy.

Everything here is JVM-native (no Python in the loop) and single-pass.

Reference parity note: the reference engine (modal-vector-db) has no sketch
surface — its DuckDB backend computes exact aggregates over a single-node
table (duckvdb.py:106-114 ``num_rows`` is the only statistic it exposes).
These operators are part of the large-scale extension surface.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dup_rate_estimate(
    df: DataFrame, cols: Sequence[str], rsd: float = 0.01
) -> DataFrame:
    """Estimate the exact-duplicate rate of ``cols`` in ONE scan, no shuffle
    of data rows (only sketch merge): ``1 - approx_ndv / count``.

    This is the sizing pass a dedup pipeline runs FIRST: if the estimated
    dup rate is ~0 there is nothing to win and the full hash-groupBy dedup
    (a shuffle of every row) can be skipped; if it is high, the estimate
    also predicts the post-dedup corpus size for capacity planning.

    Returns a 1-row DataFrame: total_rows, approx_distinct, est_dup_rate.
    ``rsd`` is the HLL++ target relative standard deviation (1% default →
    ~2.5 KB sketch per partition — constant memory at any scale).
    """
    key = F.concat_ws("\x1f", *[F.col(c).cast("string") for c in cols])
    return df.agg(
        F.count(F.lit(1)).alias("total_rows"),
        F.approx_count_distinct(key, rsd).alias("approx_distinct"),
    ).select(
        "total_rows",
        "approx_distinct",
        F.round(
            1 - F.col("approx_distinct") / F.col("total_rows"), 6
        ).alias("est_dup_rate"),
    )


def grouped_ndv(
    df: DataFrame, group_cols: Sequence[str], key_cols: Sequence[str], rsd: float = 0.02
) -> DataFrame:
    """Per-group approximate distinct counts (HLL++ partial sketches merge
    map-side, so the shuffle carries one sketch per (partition, group) — not
    one row per distinct value, which is what exact count(DISTINCT) moves)."""
    key = F.concat_ws("\x1f", *[F.col(c).cast("string") for c in key_cols])
    return df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.approx_count_distinct(key, rsd).alias("approx_distinct"),
    )


def quantile_profile(
    df: DataFrame,
    col: str,
    probs: Sequence[float] = (0.25, 0.5, 0.75, 0.95, 0.99),
    accuracy: int = 10000,
) -> DataFrame:
    """Approximate quantiles of ``col`` in one aggregation pass.

    ``accuracy`` bounds the rank error at ``1/accuracy`` of the row count
    (10000 → ±0.01% rank) with sketch memory O(accuracy·log n), independent
    of data size.  Returns one row per probability: (prob, value).
    """
    q = df.agg(
        F.percentile_approx(
            col, F.array(*[F.lit(p) for p in probs]), F.lit(accuracy)
        ).alias("qs")
    )
    pairs = F.arrays_zip(
        F.array(*[F.lit(float(p)) for p in probs]).alias("prob"),
        F.col("qs").alias("value"),
    )
    return q.select(F.explode(pairs).alias("pv")).select(
        F.col("pv.prob").alias("prob"), F.col("pv.value").alias("value")
    )


def grouped_quantiles(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    probs: Sequence[float] = (0.5, 0.9),
    accuracy: int = 10000,
) -> DataFrame:
    """Per-group approximate quantiles — the shape an exact median cannot do
    without a per-group sort; GK sketches fold into the normal partial-agg
    pipeline (one shuffle of sketches, not rows)."""
    aggs = [
        F.percentile_approx(value_col, F.lit(float(p)), F.lit(accuracy)).alias(
            f"p{int(p * 100):02d}"
        )
        for p in probs
    ]
    return df.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("n_rows"), *aggs)


def heavy_hitters(df: DataFrame, col: str, support: float = 0.01) -> list:
    """Values of ``col`` appearing in more than ``support`` fraction of rows
    (Karp-Papadimitriou-Shenker one-pass; may over-report, never misses a
    true heavy hitter).  THE pre-join skew check: any key returned here is a
    candidate for salting / AQE skew-join handling before a shuffle join on
    ``col``.  Driver-side result (list of values) — the result set is at
    most 1/support values by construction, so collecting is bounded."""
    row = df.freqItems([col], support).collect()[0]
    return sorted(row[f"{col}_freqItems"], key=lambda v: (v is None, str(v)))


def column_profile(df: DataFrame, cols: Sequence[str] | None = None, rsd: float = 0.02) -> DataFrame:
    """Per-column profile — rows, nulls, approx NDV, min/max — in ONE
    aggregation pass over the table (no per-column jobs, no sort).  The
    input to layout decisions: NDV → bucket count, null rate → filter
    strategy, min/max → partition-pruning ranges.

    Returns one row per column: (column, n_rows, n_nulls, approx_ndv,
    min_value, max_value) with min/max rendered as strings so mixed column
    types fit one schema.
    """
    cols = list(cols or df.columns)
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__rows"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
            F.approx_count_distinct(c, rsd).alias(f"{c}__ndv"),
            F.min(F.col(c).cast("string")).alias(f"{c}__min"),
            F.max(F.col(c).cast("string")).alias(f"{c}__max"),
        ]
    one = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col(f"{c}__rows").alias("n_rows"),
                F.col(f"{c}__nulls").alias("n_nulls"),
                F.col(f"{c}__ndv").alias("approx_ndv"),
                F.col(f"{c}__min").alias("min_value"),
                F.col(f"{c}__max").alias("max_value"),
            )
            for c in cols
        ]
    )
    return one.select(F.explode(per_col).alias("p")).select("p.*")
