"""Warehouse layout + DDL-equivalents.

Reference storage: one DuckDB file per logical DB at ``/db/{name}.duckdb``
(``vdb.py:15-16,38``); existence = file check (``vdb.py:43-46``);
``create_new_table=True`` drops & recreates (``duckvdb.py:26-28,34-35``).

Spark mapping: one Parquet directory per named DB under a warehouse root.
At 100 TB the directory is partitioned (optionally by an IVF ``cluster_id``
for partition-pruned ANN — see ``operators/ann.py``) and appended
atomically per batch via Spark's committer.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

DEFAULT_WAREHOUSE = os.environ.get("SPARKVDB_WAREHOUSE", "/tmp/sparkvdb_warehouse")


def db_path(name: str, warehouse: str | None = None) -> str:
    return os.path.join(warehouse or DEFAULT_WAREHOUSE, name)


def table_exists(name: str, warehouse: str | None = None) -> bool:
    """Existence = directory existence with at least one parquet footer
    (the reference's ``os.path.exists`` check, ``vdb.py:43-46``).  Walks into
    subdirectories because partitioned tables (e.g. the IVF layout's
    ``cluster_id=N/``) keep their files one level down."""
    p = db_path(name, warehouse)
    if not os.path.isdir(p):
        return False
    for _, _, files in os.walk(p):
        if any(f.endswith(".parquet") for f in files):
            return True
    return False


def drop_table(name: str, warehouse: str | None = None) -> None:
    """``DROP TABLE IF EXISTS`` analog (``duckvdb.py:34-35``)."""
    p = db_path(name, warehouse)
    if os.path.isdir(p):
        shutil.rmtree(p)


def list_tables(warehouse: str | None = None) -> list[dict]:
    """Catalog listing: every table directory under the warehouse with its
    kind — ``plain`` (parquet dir), ``versioned`` (manifest log), or
    ``derived`` (the ``__ivf``/``__pq_codebooks``/``__ivf_centroids``
    side-tables an index build writes).  The ops surface the reference gets
    for free from ``ls /db/*.duckdb``."""
    root = warehouse or DEFAULT_WAREHOUSE
    if not os.path.isdir(root):
        return []
    out = []
    for name in sorted(os.listdir(root)):
        p = os.path.join(root, name)
        if not os.path.isdir(p):
            continue
        if os.path.isdir(os.path.join(p, "_manifests")):
            kind = "versioned"
        elif any(name.endswith(s) for s in ("__ivf", "__ivf_centroids", "__pq_codebooks")):
            kind = "derived"
        elif table_exists(name, warehouse):
            kind = "plain"
        else:
            continue  # staging leftovers / empty dirs are not tables
        out.append({"name": name, "kind": kind})
    return out


def read_table(spark: SparkSession, name: str, warehouse: str | None = None) -> DataFrame:
    return spark.read.parquet(db_path(name, warehouse))


def append(df: DataFrame, name: str, warehouse: str | None = None, partition_by: list[str] | None = None) -> None:
    w = df.write.mode("append")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(db_path(name, warehouse))


def overwrite(df: DataFrame, name: str, warehouse: str | None = None, partition_by: list[str] | None = None) -> None:
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(db_path(name, warehouse))


def table_file_stats(name: str, warehouse: str | None = None) -> tuple[int, int]:
    """(n_parquet_files, total_bytes) for a table directory — the fragmentation
    signal that drives :func:`compact`."""
    p = db_path(name, warehouse)
    n, total = 0, 0
    for root, _, files in os.walk(p):
        for f in files:
            if f.endswith(".parquet"):
                n += 1
                total += os.path.getsize(os.path.join(root, f))
    return n, total


def compact(
    spark: SparkSession,
    name: str,
    warehouse: str | None = None,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Small-file compaction: rewrite the table into
    ``ceil(total_bytes / target_file_bytes)`` files.  Returns the new file
    count.

    Every idempotent-append batch adds files (Spark's committer never
    rewrites existing data), so a hot ingest table fragments toward
    one-file-per-batch — and scan task count (+ scheduler pressure +
    parquet footer reads) grows with file count, not data size.  The same
    maintenance op every table format ships (Delta OPTIMIZE, Iceberg
    rewrite_data_files), expressed directly over the parquet layout.
    Single-writer, like the write path: run it from the maintenance job,
    not concurrently with inserts."""
    import math

    _, total = table_file_stats(name, warehouse)
    n_files = max(1, math.ceil(total / target_file_bytes))
    df = read_table(spark, name, warehouse)
    # Stage into a sibling dir then swap: the source must be fully read
    # before its directory is overwritten.
    p = db_path(name, warehouse)
    tmp = p + "__compacting"
    df.repartition(n_files).write.mode("overwrite").parquet(tmp)
    shutil.rmtree(p)
    os.rename(tmp, p)
    return n_files


def rewrite_where(
    spark: SparkSession,
    name: str,
    keep,
    warehouse: str | None = None,
) -> int:
    """Rewrite the table keeping only rows where the ``keep`` Column holds;
    returns the number of rows removed.

    Same stage-into-sibling-then-swap protocol as :func:`compact` (the
    source is fully materialized before its directory is replaced; readers
    see the old or the new directory, never a partial one).  This is the
    copy-on-write delete every immutable-file table format performs
    (Delta/Iceberg DELETE) — at 100 TB you'd add file-level pruning so only
    files whose footer stats can contain matches are rewritten; the
    stats machinery for that is ``operators/layout.py:file_stats_pruned``.
    Single-writer, like the write path."""
    df = read_table(spark, name, warehouse)
    total = df.count()
    p = db_path(name, warehouse)
    tmp = p + "__rewriting"
    df.filter(keep).write.mode("overwrite").parquet(tmp)
    kept = spark.read.parquet(tmp).count()
    shutil.rmtree(p)
    os.rename(tmp, p)
    return total - kept


def replace_table(
    df: DataFrame,
    name: str,
    warehouse: str | None = None,
    partition_by: list[str] | None = None,
) -> int:
    """Atomically replace table ``name`` with ``df`` — which MAY read from
    the table it replaces (the copy-on-write update case): the plan is fully
    materialized into a sibling staging directory before the swap, so the
    self-reference is resolved against the old files.  Returns the new row
    count.  Same reader guarantee as :func:`compact`/:func:`rewrite_where`
    (old directory or new, never partial); single-writer like the write
    path."""
    p = db_path(name, warehouse)
    tmp = p + "__replacing"
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(tmp)
    n = df.sparkSession.read.parquet(tmp).count()
    shutil.rmtree(p)
    os.rename(tmp, p)
    return n


def read_json_source(spark: SparkSession, path: str) -> DataFrame:
    """S3 analog — JSON file source (``vdb.py:79``); multiLine handles the
    pokemon.json-style single-array layout."""
    return spark.read.json(path, multiLine=True)
