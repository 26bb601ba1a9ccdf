"""Time the DuckDB oracle for every query that has one (the BASELINE.md
'within 2x' comparison target).  Prints one JSON line mirroring bench.py."""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("BENCH_RUNS", "3"))


def main() -> None:
    import duckdb

    import __spark_entry__ as E

    con = duckdb.connect()
    con.execute(f"PRAGMA threads={os.environ.get('SPARK_GRAFT_CPUS', os.cpu_count() or 8)}")
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings".split()
    ):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    timings: dict[str, float] = {}
    for name, sql in E.oracle_sql().items():
        try:
            con.execute(sql).fetchall()  # warmup
            samples = []
            for _ in range(RUNS):
                t0 = time.perf_counter()
                con.execute(sql).fetchall()
                samples.append(time.perf_counter() - t0)
            timings[name] = round(statistics.median(samples), 4)
        except Exception as e:
            print(f"baseline error in {name}: {e}", file=sys.stderr)
            timings[name] = -1.0
    total = round(sum(v for v in timings.values() if v > 0), 4)
    print(
        json.dumps(
            {
                "metric": "duckdb_sum_median_query_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1]),
            }
        )
    )


if __name__ == "__main__":
    main()
