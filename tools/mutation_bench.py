"""Mutation-path scale evidence: file-pruned copy-on-write vs full rewrite.

Builds a documents-derived corpus spread across N range-partitioned files
(disjoint doc_id ranges per file — the layout a sorted/z-ordered ingest
produces), then times a one-range takedown three ways:

  full     — rewrite the whole table minus the matches (what delete() did
             before round 4, and what a format without file pruning must do)
  pruned   — plain-catalog file-pruned rewrite: input_file_name() scan finds
             the touched file(s), untouched files hardlink-carried
  manifest — versioned backend with prune_between: manifest min/max stats
             exclude non-overlapping files from the match scan itself

Prints ONE JSON line.  The interesting quantity is the growth: `full` scales
with corpus size, `pruned` with (scan + touched-file size), `manifest` with
touched-file size alone — at 100 TB that is the difference between a
full-corpus rewrite and a single-file one.

Usage: python tools/mutation_bench.py [sf_dir] [n_files]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from modal_vector_db_spark.session import get_spark  # noqa: E402
from modal_vector_db_spark.sources import catalog, versioned as vcat  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    replicate = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    spark = get_spark("mutation-bench", shuffle_partitions=32)
    wh = tempfile.mkdtemp(prefix="mut_bench_")
    base = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n_base = base.count()
    # replicate the corpus (re-keyed, disjoint doc_id ranges) and fatten each
    # row to ~2.4 KB (replica-salted text, so neither parquet dictionaries
    # nor snappy can collapse the copies) — rewrite cost must be I/O-bound,
    # not scheduler floor, for the comparison to mean anything at scale
    docs = base.crossJoin(spark.range(replicate).select(F.col("id").alias("_r"))).select(
        (F.col("doc_id") + F.col("_r") * n_base).alias("doc_id"),
        F.concat_ws(" ", *[
            F.concat(F.col("text"), F.lit(" v"), (F.col("_r") * 8 + i).cast("string"))
            for i in range(8)
        ]).alias("text"),
        "lang",
        "source",
    )
    n_docs = n_base * replicate
    # one file's worth of doc_ids is the takedown target
    span = max(1, n_docs // n_files)
    lo, hi = 2 * span, 3 * span - 1  # entirely inside one range file
    keep = ~F.col("doc_id").between(lo, hi)
    src = docs.repartitionByRange(n_files, "doc_id")

    out: dict = {"n_docs": n_docs, "n_files": n_files, "rows_removed": hi - lo + 1}

    def _inodes(table):
        p = catalog.db_path(table, wh)
        return {
            os.stat(os.path.join(root, f)).st_ino: os.path.getsize(os.path.join(root, f))
            for root, _, fs in os.walk(p)
            for f in fs
            if f.endswith(".parquet")
        }

    def _bytes_rewritten(table, before):
        # files whose inode did not exist before the mutation were written;
        # hardlink-carried / manifest-carried files keep their inode
        after = _inodes(table)
        return sum(sz for ino, sz in after.items() if ino not in before)

    # -- full rewrite (pre-round-4 shape) ----------------------------------
    catalog.overwrite(src, "mb_full", wh)
    before = _inodes("mb_full")
    out["table_bytes"] = sum(before.values())
    t0 = time.time()
    catalog.replace_table(
        catalog.read_table(spark, "mb_full", wh).filter(keep), "mb_full", wh
    )
    out["full_rewrite_sec"] = round(time.time() - t0, 3)
    out["full_bytes_rewritten"] = _bytes_rewritten("mb_full", before)

    # -- plain file-pruned --------------------------------------------------
    catalog.overwrite(src, "mb_pruned", wh)
    before = _inodes("mb_pruned")
    t0 = time.time()
    removed = catalog.rewrite_where(spark, "mb_pruned", keep, wh)
    out["pruned_sec"] = round(time.time() - t0, 3)
    assert removed == out["rows_removed"], (removed, out)
    out["pruned_bytes_rewritten"] = _bytes_rewritten("mb_pruned", before)
    files, _ = catalog._leaf_files("mb_pruned", wh)
    out["pruned_files_after"] = len(files)

    # -- versioned + manifest-stats pre-pruning -----------------------------
    vcat.overwrite(src, "mb_manifest", wh, stats_cols=["doc_id"])
    out["manifest_candidates"] = len(
        vcat.resolve_files("mb_manifest", wh, between=("doc_id", lo, hi))
    )
    before = _inodes("mb_manifest")
    t0 = time.time()
    removed = vcat.rewrite_where(
        spark, "mb_manifest", keep, wh, stats_cols=["doc_id"],
        prune_between=("doc_id", lo, hi),
    )
    out["manifest_sec"] = round(time.time() - t0, 3)
    assert removed == out["rows_removed"], (removed, out)
    out["manifest_bytes_rewritten"] = _bytes_rewritten("mb_manifest", before)

    # verify all three agree
    a = catalog.read_table(spark, "mb_full", wh).count()
    b = catalog.read_table(spark, "mb_pruned", wh).count()
    c = vcat.read_table(spark, "mb_manifest", wh).count()
    assert a == b == c == n_docs - out["rows_removed"], (a, b, c)

    shutil.rmtree(wh)
    out["speedup_pruned"] = round(out["full_rewrite_sec"] / out["pruned_sec"], 2)
    out["speedup_manifest"] = round(out["full_rewrite_sec"] / out["manifest_sec"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
