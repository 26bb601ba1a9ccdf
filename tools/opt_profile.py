"""Per-query cost split: fn() construction (driver/plan side) vs collect()
(execution), plus job counts — guide §1 measurement for the optimization
rounds.

Usage: python tools/opt_profile.py <query>[,<query>...] [sf_dir] [reps]

For each query: one untimed warmup (fn + collect), then `reps` timed
invocations measuring fn() and .collect() separately.  Prints one line per
query with medians.  Job count delta comes from the status tracker.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    names = sys.argv[1].split(",")
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 5

    import __spark_entry__ as E
    from modal_vector_db_spark.session import get_spark

    spark = get_spark(
        "opt_profile", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = E.queries()
    tracker = spark.sparkContext.statusTracker()
    for name in names:
        fn = qs[name]
        fn(spark, sf_dir).collect()  # warmup
        f_times, c_times, jobs = [], [], []
        for _ in range(reps):
            j0 = len(tracker.getJobIdsForGroup(None) or [])
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.collect()
            t2 = time.perf_counter()
            j1 = len(tracker.getJobIdsForGroup(None) or [])
            f_times.append(t1 - t0)
            c_times.append(t2 - t1)
            jobs.append(j1 - j0)
        print(
            f"{name}: fn={statistics.median(f_times):.3f}s "
            f"collect={statistics.median(c_times):.3f}s "
            f"jobs/invocation={statistics.median(jobs):.0f} "
            f"(fn samples {['%.3f' % t for t in f_times]}, "
            f"collect samples {['%.3f' % t for t in c_times]})"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
