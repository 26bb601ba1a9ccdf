"""Per-round benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS].  Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Protocol (BASELINE.md): warm JVM — one untimed warmup pass per query, then
median of 3 timed runs; target within 2x DuckDB on the same parquet.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("BENCH_RUNS", "3"))


def main() -> None:
    import __spark_entry__ as E
    from modal_vector_db_spark.session import get_spark

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = E.queries()
    timings: dict[str, float] = {}
    for name, fn in qs.items():
        try:
            fn(spark, SF_DIR).collect()  # warmup (plan + JIT + file listing)
            samples = []
            for _ in range(RUNS):
                t0 = time.perf_counter()
                fn(spark, SF_DIR).collect()
                samples.append(time.perf_counter() - t0)
            timings[name] = round(statistics.median(samples), 4)
        except Exception as e:  # never let one query sink the bench line
            print(f"bench error in {name}: {e}", file=sys.stderr)
            timings[name] = -1.0
    total = round(sum(v for v in timings.values() if v > 0), 4)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "sum_median_query_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
            }
        )
    )


if __name__ == "__main__":
    main()
