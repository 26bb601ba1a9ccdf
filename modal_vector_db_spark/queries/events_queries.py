"""Event-stream analytics over ``events`` — the batch twins of the
Structured Streaming surface (SURVEY §2.10).  Each query here runs as a
plain DataFrame job; ``streaming/events.py`` re-expresses the same
transformations over ``readStream`` and ``tests/test_streaming.py`` asserts
stream == batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from modal_vector_db_spark.harness import load, register
from modal_vector_db_spark.operators.filters import compile_filters, filters_to_duckdb_sql

DEC = "decimal(18,4)"


@register(
    "events_window_agg",
    oracle="""
    SELECT time_bucket(INTERVAL '5 minutes', ts) AS window_start,
           event_type,
           count(*) AS n,
           round(sum(value::DECIMAL(18,4))::DOUBLE, 4) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def events_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 5-minute window aggregate (streaming twin: watermarked
    ``groupBy(window(ts))`` — same plan minus the state store)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("value").cast(DEC)).cast("double"), 4).alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "sum_value")
    )


@register(
    "events_sliding_window",
    oracle="""
    WITH offsets AS (SELECT unnest([0, 5]) AS off),
    b AS (
      SELECT time_bucket(INTERVAL '10 minutes', ts - to_minutes(off)) + to_minutes(off) AS window_start,
             value
      FROM events, offsets
      WHERE time_bucket(INTERVAL '10 minutes', ts - to_minutes(off)) + to_minutes(off) <= ts
        AND ts < time_bucket(INTERVAL '10 minutes', ts - to_minutes(off)) + to_minutes(off) + INTERVAL '10 minutes'
    )
    SELECT window_start, count(*) AS n,
           round(sum(value::DECIMAL(18,4))::DOUBLE, 4) AS sum_value
    FROM b GROUP BY window_start
    """,
)
def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (10 min length, 5 min slide): each event lands in 2
    overlapping windows.  Spark's window() explodes the assignment natively."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("value").cast(DEC)).cast("double"), 4).alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n", "sum_value")
    )


@register(
    "events_sessionize",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    ),
    sessions AS (
      SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                                 ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged
    )
    SELECT user_id, min(ts) AS session_start, count(*) AS n_events,
           round(sum(value::DECIMAL(18,4))::DOUBLE, 4) AS sum_value
    FROM sessions GROUP BY user_id, sid
    """,
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows with a 30-minute inactivity gap via
    ``session_window`` (streaming-capable operator running in batch).
    Oracle is the classic gaps-and-islands rewrite — a strong semantic
    cross-check that Spark's merge rule (join iff gap < 30min) matches."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast(DEC)).cast("double"), 4).alias("sum_value"),
        )
        .select(F.col("user_id"), F.col("w.start").alias("session_start"), "n_events", "sum_value")
    )


_PROPS_FILTER = {"k": (">", 50)}


@register(
    "events_json_filter",
    oracle=f"""
    SELECT event_type, count(*) AS n
    FROM events
    WHERE {filters_to_duckdb_sql(_PROPS_FILTER, "props")}
    GROUP BY event_type
    """,
)
def events_json_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The metadata filter compiler applied to a second JSON column
    (``props``) — proves the DSL is column-agnostic."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.filter(compile_filters(_PROPS_FILTER, metadata="props"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "events_dedup",
    oracle="""
    SELECT count(*) AS n_unique, sum(cnt - 1)::BIGINT AS n_dropped FROM (
      SELECT event_id, count(*) AS cnt FROM (
        SELECT event_id FROM events UNION ALL
        SELECT event_id FROM events WHERE event_id % 3 = 0
      ) GROUP BY event_id) t
    """,
)
def events_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on the event key (streaming twin:
    ``dropDuplicatesWithinWatermark`` — the reference's idempotent-insert S5
    in stream form).  Input is events ∪ a 1/3 replay to force duplicates."""
    ev = load(spark, sf_dir, "events").select("event_id")
    replay = ev.filter(F.col("event_id") % 3 == 0)
    both = ev.union(replay)
    deduped = both.dropDuplicates(["event_id"])
    n_unique = deduped.count()
    n_dropped = both.count() - n_unique
    return (
        load(spark, sf_dir, "region")
        .limit(1)
        .select(
            F.lit(n_unique).cast("long").alias("n_unique"),
            F.lit(n_dropped).cast("long").alias("n_dropped"),
        )
    )


@register(
    "events_asof_join",
    oracle="""
    SELECT l.event_id, l.user_id, round(r.value, 4) AS last_purchase_value
    FROM (SELECT * FROM events WHERE event_type = 'click') l
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
      ON l.user_id = r.user_id AND l.ts >= r.ts
    """,
)
def events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time enrichment: each click picks up the latest prior
    purchase value for the same user (operators/asof.py — union + window,
    one shuffle on user_id, no row multiplication; DuckDB expresses the same
    thing as ASOF LEFT JOIN)."""
    from modal_vector_db_spark.operators.asof import asof_join

    ev = load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click")
    purchases = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts", "value")
    joined = asof_join(clicks, purchases, on="ts", by="user_id", value_cols=["value"])
    return joined.select(
        "event_id", "user_id", F.round(F.col("value_r"), 4).alias("last_purchase_value")
    )


@register(
    "events_variant_agg",
    oracle="""
    SELECT json_extract(props, 'k')::INT // 10 AS k_bucket,
           count(*) AS n,
           round(sum(value::DECIMAL(18,4))::DOUBLE, 4) AS sum_value
    FROM events
    GROUP BY k_bucket
    """,
)
def events_variant_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VariantType path: ``parse_json(props)`` once into a Variant,
    typed extraction with ``variant_get`` — the binary-encoded alternative
    to per-access ``get_json_object`` string re-parsing (the right choice
    when many fields of the same JSON column are probed at 100 TB)."""
    ev = load(spark, sf_dir, "events")
    v = ev.withColumn("pv", F.parse_json("props"))
    return (
        v.select(
            (F.variant_get("pv", "$.k", "int") / F.lit(10)).cast("int").alias("k_bucket"),
            "value",
        )
        .groupBy("k_bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("value").cast("decimal(18,4)")).cast("double"), 4).alias(
                "sum_value"
            ),
        )
    )
