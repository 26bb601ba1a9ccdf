"""Continuous crawl ingestion — Structured Streaming over a WARC landing
directory.  Real crawls arrive segment by segment (a fetcher fleet drops
``*.warc.gz`` files continuously); this wires that arrival into the
engine with exactly-once file tracking plus content-level idempotency:

- the ``binaryFile`` FILE SOURCE tracks seen files in the checkpoint, so
  a restarted stream never re-reads a processed segment (source-level
  exactly-once);
- each micro-batch runs the SAME batch pipeline as
  ``VectorDB.load_from_warc`` (``records_from_binary_df`` →
  ``crawl_pages_to_metadata`` → ``insert_df``) via ``foreachBatch`` —
  re-crawled pages in NEW segments still dedup through the engine's
  content-id anti-join (content-level idempotency on top of the
  source's file-level guarantee);
- ``Trigger.AvailableNow`` drains everything pending then stops (the
  deterministic-test trigger and the "catch up the backlog" operational
  mode); omit it for a long-running ingest.

At 100 TB this is the crawl-side mirror of ``streaming/events.py``'s
event ingest: landing files are the offsets, micro-batches are bounded
by arrival, and every stage inside the batch is the already-audited
batch plan (file-per-task walk, pure-map extraction, anti-join insert).
"""

from __future__ import annotations

from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

#: binaryFile's fixed schema — streaming file sources require it upfront
_BINARY_FILE_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("modificationTime", T.TimestampType()),
        T.StructField("length", T.LongType()),
        T.StructField("content", T.BinaryType()),
    ]
)


def stream_crawl_ingest(
    db,
    landing_dir: str,
    checkpoint_dir: str,
    *,
    glob: str = "*.warc*",
    text_tier: str = "parser",
    embed_field: str = "text",
    on_error: str = "skip",
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """Start the crawl-ingest stream into ``db`` (a ``VectorDB``).
    Returns the :class:`StreamingQuery`; callers ``awaitTermination()``
    (AvailableNow) or manage the handle (continuous).
    ``max_files_per_trigger`` bounds micro-batch size — segment files
    are ~1 GiB each, so this is the ingest's memory/latency knob."""
    from modal_vector_db_spark.operators.html_extract import crawl_pages_to_metadata
    from modal_vector_db_spark.sources.warc import records_from_binary_df

    if text_tier not in ("parser", "catalyst"):
        raise ValueError(f"text_tier must be 'parser' or 'catalyst', got {text_tier!r}")
    reader = (
        db.spark.readStream.format("binaryFile")
        .schema(_BINARY_FILE_SCHEMA)
        .option("pathGlobFilter", glob)
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    bf = reader.load(landing_dir)

    def _batch(batch_df, _batch_id: int) -> None:
        recs = records_from_binary_df(batch_df, types=("response",), on_error=on_error)
        meta = crawl_pages_to_metadata(recs, text_tier)
        # same identity rule as load_from_warc: content, not capture date
        # (a table-level id_fields declaration wins)
        db.insert_df(
            meta,
            embed_field=embed_field,
            id_fields=getattr(db, "id_fields", None) or ("url", "title", "text"),
        )

    writer = (
        bf.writeStream.foreachBatch(_batch)
        .option("checkpointLocation", checkpoint_dir)
        .queryName("crawl_ingest")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
