"""As-of (point-in-time) join — a temporal operator Spark lacks natively.

``asof_join(left, right, on, by)`` matches each left row to the single most
recent right row with ``right.on <= left.on`` within the same ``by`` group —
the canonical market-data / event-enrichment join (DuckDB ships it as
``ASOF JOIN``; the reference has no time semantics at all, so this is pure
extension surface for the events fixture).

Spark-first implementation: **union + window**, not a join.  Tag both inputs,
union them (schema-aligned), and run ``last(value, ignorenulls) OVER
(PARTITION BY by ORDER BY ts, is_left)`` — each left row picks up the latest
preceding right value in one pass.

Scale shape: ONE shuffle on the ``by`` key (the window partition), linear
state, no row multiplication — strictly better at 100 TB than the naive
range-join (left × right within group, then rank) whose intermediate is
quadratic in group size.  Skewed ``by`` keys fall under AQE skew handling
like any window.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Sequence[str] | str,
    value_cols: Sequence[str] | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Point-in-time join: latest right row with ``right.on <= left.on`` per
    ``by`` group; right value columns arrive suffixed (null when no prior
    right row exists — left rows are always kept, like a LEFT ASOF JOIN).
    """
    by = [by] if isinstance(by, str) else list(by)
    value_cols = list(value_cols) if value_cols is not None else [
        c for c in right.columns if c != on and c not in by
    ]

    lt = left.withColumn("_is_left", F.lit(1))
    for c in value_cols:
        lt = lt.withColumn(f"{c}{suffix}", F.lit(None).cast(dict(right.dtypes)[c]))
    rt = right.select(
        *by,
        F.col(on),
        F.lit(0).alias("_is_left"),
        *[F.col(c).alias(f"{c}{suffix}") for c in value_cols],
    )
    extra_left = [c for c in lt.columns if c not in rt.columns]
    for c in extra_left:
        rt = rt.withColumn(c, F.lit(None).cast(dict(lt.dtypes)[c]))
    merged = lt.select(*sorted(lt.columns)).unionByName(rt.select(*sorted(rt.columns)))

    # Right rows sort before left rows at the same timestamp, so an exactly
    # simultaneous right row IS visible to the left row (<=, matching DuckDB
    # ASOF semantics).
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col("_is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = merged
    for c in value_cols:
        filled = filled.withColumn(
            f"{c}{suffix}", F.last(F.col(f"{c}{suffix}"), ignorenulls=True).over(w)
        )
    return filled.filter(F.col("_is_left") == 1).drop("_is_left")
