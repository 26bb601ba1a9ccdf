"""Physical-layout operators: bucketing and skew salting.

The reference delegates all physical strategy to DuckDB's single-node
executor; at cluster scale the two layout decisions that dominate join/agg
cost are (a) co-locating repeatedly-joined facts so the shuffle happens once
at write time, and (b) breaking hot keys so no single reducer drowns.

- **Bucketing**: ``write_bucketed`` persists a table hash-bucketed (and
  bucket-sorted) on its join key.  Two tables bucketed the same way join as
  bucket-local sort-merge with NO Exchange on either side — the shuffle was
  pre-paid at write time and amortizes over every subsequent join
  (verified by plan assertion in tests/test_layout.py).
- **Salting**: ``salted_agg`` runs a two-phase aggregate — first over
  (key, salt) to spread a hot key across ``n_salts`` reducers, then over
  key to combine.  Works for any algebraic aggregate (sum/count/min/max);
  AQE's skew-join handling covers the join side, this covers the agg side.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 16,
    sort: bool = True,
) -> None:
    """Persist ``df`` hash-bucketed (and optionally bucket-sorted) on
    ``bucket_col``.  Joins between tables bucketed identically on the join
    key skip the shuffle entirely."""
    w = df.write.mode("overwrite").bucketBy(num_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    w.format("parquet").saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str | list[str], how: str = "inner"
) -> DataFrame:
    """Join two co-bucketed tables — plans as Exchange-free sort-merge."""
    return spark.table(left_table).join(spark.table(right_table), on, how)


#: op → (phase-1 partial fn, phase-2 recombine fn).  Partial counts ADD.
_ALGEBRAIC = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` maps output-column name → ``(op, input_col)`` with op in
    {sum, count, min, max} (the algebraic aggregates that decompose).
    Phase 1 aggregates over (keys, salt) so a hot key's rows split across
    ``n_salts`` partial groups on different reducers; phase 2 re-aggregates
    the partials by key.  The salt is derived deterministically from the
    row's physical position — uniform by construction, no rand()."""
    salted = df.withColumn(
        "_salt",
        F.pmod(F.spark_partition_id() + F.monotonically_increasing_id(), F.lit(n_salts)),
    )
    partials, finals = [], []
    for name, (op, col) in aggs.items():
        if op not in _ALGEBRAIC:
            raise ValueError(f"non-algebraic aggregate for salted_agg: {op!r}")
        p_fn, r_fn = _ALGEBRAIC[op]
        partials.append(p_fn(col).alias(f"_p_{name}"))
        finals.append(r_fn(F.col(f"_p_{name}")).alias(name))
    phase1 = salted.groupBy(*keys, "_salt").agg(*partials)
    return phase1.groupBy(*keys).agg(*finals)


def write_training_shards(
    df: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    tokens_per_shard: int = 2048,
    buckets: int = 32,
) -> None:
    """Export stage of the training-data pipeline: pack documents into
    fixed token-budget shards (same streaming-pack rule as
    ``queries/pipeline_queries.py:text_pack_sequences`` — a doc whose
    tokens straddle the budget boundary opens the next shard) and write a
    ``shard=<bucket>_<pack>``-partitioned parquet dataset, one directory
    per training shard.

    Scale shape: packing is sequential, so it runs within ``buckets`` hash
    buckets — ONE shuffle for the running-sum window, one for the
    partitioned write, bounded per-task state; ``buckets`` is the
    parallelism knob (shard count grows with data, bucket count does not).
    Downstream trainers list shard directories and stream each
    independently."""
    from pyspark.sql.window import Window

    from modal_vector_db_spark.functions.text import token_count

    t = df.withColumn("_bucket", F.col(id_col) % buckets).withColumn(
        "_tokens", token_count(text_col)
    )
    w = Window.partitionBy("_bucket").orderBy(id_col)
    prior = F.sum("_tokens").over(w.rowsBetween(Window.unboundedPreceding, -1))
    packed = t.withColumn(
        "shard",
        F.concat_ws(
            "_",
            F.col("_bucket").cast("string"),
            (F.coalesce(prior, F.lit(0)) / tokens_per_shard).cast("long").cast("string"),
        ),
    ).drop("_bucket")
    packed.repartition("shard").write.mode("overwrite").partitionBy("shard").parquet(path)


_GRANULARITY_FMT = {"hour": "yyyy-MM-dd-HH", "day": "yyyy-MM-dd", "month": "yyyy-MM"}


def write_time_partitioned(
    df: DataFrame,
    path: str,
    ts_col: str = "ts",
    granularity: str = "day",
) -> None:
    """Hypertable-style layout for event/time-series tables: one directory
    per time bucket (``p_bucket=yyyy-MM-dd``), so a time-range query prunes
    whole partitions at FILE-LISTING time — at 100 TB the difference between
    scanning a day and scanning three years.

    The ``repartition("p_bucket")`` before the write gives one task per
    bucket (no thousand-small-files-per-bucket fragmentation from every
    input task writing to every bucket); at larger per-bucket volumes add a
    second repartition key to re-widen within buckets."""
    if granularity not in _GRANULARITY_FMT:
        raise ValueError(f"granularity must be one of {sorted(_GRANULARITY_FMT)}")
    part = F.date_format(F.col(ts_col), _GRANULARITY_FMT[granularity])
    (
        df.withColumn("p_bucket", part)
        .repartition("p_bucket")
        .write.mode("overwrite")
        .partitionBy("p_bucket")
        .parquet(path)
    )


def time_range_scan(
    spark: SparkSession,
    path: str,
    ts_col: str,
    start: str,
    end: str,
    granularity: str = "day",
) -> DataFrame:
    """Read a time-partitioned dataset restricted to ``[start, end)``.

    Applies BOTH predicates the layout needs: the derived ``p_bucket``
    range (string-ordered because the formats are zero-padded
    big-endian — this is what prunes directories) and the exact ``ts_col``
    bounds (which trim the partial buckets at each edge and push down to
    parquet row groups).  Callers filtering only on ``ts_col`` would scan
    every partition; this helper makes the pruned path the easy path."""
    fmt = _GRANULARITY_FMT[granularity]
    lo = F.date_format(F.lit(start).cast("timestamp"), fmt)
    hi = F.date_format(F.lit(end).cast("timestamp"), fmt)
    return (
        spark.read.parquet(path)
        .filter(F.col("p_bucket").between(lo, hi))
        .filter(
            (F.col(ts_col) >= F.lit(start).cast("timestamp"))
            & (F.col(ts_col) < F.lit(end).cast("timestamp"))
        )
    )
