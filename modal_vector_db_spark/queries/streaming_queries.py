"""Structured Streaming driver-contract query (SURVEY §2.10).

The reference is batch-only; streaming is this repo's scale-out extension
(``streaming/events.py``).  ``tests/test_streaming.py`` asserts
stream == batch for six operators; this module additionally registers ONE
of them — the watermarked tumbling-window aggregate — as a driver-checked
query so the streaming engine gets a hard (DuckDB-oracled) correctness
row, not just self-reported parity.

Semantics under test: file-source stream → 10-minute watermark →
5-minute tumbling windows → append-mode memory sink drained with
``Trigger.AvailableNow``.  Append mode emits exactly the windows CLOSED by
the final watermark (window.end <= max(ts) - 10 min); the oracle computes
the same batch aggregate with the same cutoff — so a pass proves window
assignment, watermark semantics, AND the emission rule against an
independent engine.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession

from modal_vector_db_spark.harness import load, register
from modal_vector_db_spark.streaming import events as SE

_STREAMFIX_CACHE: dict[str, str] = {}


def _stream_fixture_dir(spark: SparkSession, sf_dir: str) -> str:
    """Re-write the events fixture as a 4-file parquet directory (µs
    timestamps, multiple files for the source to discover).  FIXTURE SETUP,
    once per process per sf_dir — in production the stream source is a
    Kafka topic / object-store prefix that already exists."""
    hit = _STREAMFIX_CACHE.get(sf_dir)
    if hit is not None:
        return hit
    out = os.path.join(
        tempfile.gettempdir(), "sparkvdb_streamfix", sf_dir.strip("/").replace("/", "_")
    )
    load(spark, sf_dir, "events").repartition(4).write.mode("overwrite").parquet(out)
    _STREAMFIX_CACHE[sf_dir] = out
    return out


@register(
    "streaming_windows",
    oracle="""
    SELECT window_start, event_type, n, sum_value FROM (
      SELECT time_bucket(INTERVAL '5 minutes', ts) AS window_start, event_type,
             count(*) AS n,
             round(sum(value::DECIMAL(18,4))::DOUBLE, 4) AS sum_value
      FROM events GROUP BY 1, 2) t
    WHERE window_start + INTERVAL '5 minutes'
          <= (SELECT max(ts) - INTERVAL '10 minutes' FROM events)
    """,
    cache=False,  # each invocation must run the stream, not re-read the sink
)
def streaming_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked streaming tumbling-window counts, drained deterministically
    (AvailableNow → memory sink).  Each fresh invocation runs the stream with
    a fresh checkpoint + sink name (a resumed checkpoint would emit nothing);
    the returned DataFrame reads the drained sink table."""
    path = _stream_fixture_dir(spark, sf_dir)
    name = "sw_" + uuid.uuid4().hex[:12]
    cp = tempfile.mkdtemp(prefix="sparkvdb_sw_cp_")
    stream = SE.windowed_counts(SE.read_event_stream(spark, path))
    return SE.run_to_memory(stream, name, cp)
