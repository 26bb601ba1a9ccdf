"""Bloom sizing sweep: measured false-positive/candidate counts and wall
time vs ``num_bits`` for the cross-corpus admission shape
(operators/bloom.py), on the real fixture corpus.

Why measure: the verify join's cost is proportional to CANDIDATES =
true matches + false positives.  Theory says ~9.6 bits/key at 1% fpp;
this sweep shows what the fixture actually pays at each size so the
production default is a number read off a table, not a formula trusted
blind (the hubstar_recall.py rule).

Usage: python tools/bloom_sweep.py [sf_dir]
Prints one JSON line: per-num_bits {candidates, true, fps, fp_rate, sec}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
    "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
)


def main() -> None:
    from pyspark.sql import functions as F

    from modal_vector_db_spark.operators.bloom import (
        bloom_build,
        bloom_might_contain,
    )
    from modal_vector_db_spark.session import get_spark

    spark = get_spark("bloom-sweep", extra_conf={
        "spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).select(
        "doc_id", "text"
    )
    build = docs.select("text")
    n_build = build.count()
    # probe: half verbatim corpus copies (true matches), half new
    probe = docs.filter(F.col("doc_id") % 2 == 0).select(
        F.col("doc_id").alias("doc_id"), "text"
    ).union(
        docs.filter(F.col("doc_id") % 2 == 1).select(
            (F.col("doc_id") + 10_000_000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" xx")).alias("text"),
        )
    )
    true_ids = {
        r["doc_id"] for r in probe.join(build, ["text"], "left_semi").collect()
    }
    out = {"sf_dir": SF_DIR, "build_keys": n_build, "sweep": {}}
    k = 5
    for bits_pow in (14, 16, 18, 20, 22):
        m = 1 << bits_pow
        t0 = time.perf_counter()
        words = bloom_build(build, ["text"], m, k, seed=7)
        flagged = bloom_might_contain(probe, words, ["text"], m, k, seed=7)
        hits = {r["doc_id"] for r in flagged.collect() if r["_bloom_hit"]}
        sec = round(time.perf_counter() - t0, 2)
        fps = len(hits - true_ids)
        negatives = max(1, flagged.count() - len(true_ids))
        assert true_ids <= hits, "FALSE NEGATIVE — contract violation"
        out["sweep"][f"2^{bits_pow}"] = {
            "bits_per_key": round(m / max(1, n_build), 1),
            "candidates": len(hits),
            "true": len(true_ids),
            "fps": fps,
            "fp_rate": round(fps / negatives, 4),
            "sec": sec,
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
