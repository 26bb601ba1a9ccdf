"""Capture .explain('formatted') for every registered query into a directory.

Usage: python tools/capture_plans.py <out_dir> [sf_dir] [--only name[,name...]]

Writes <out_dir>/<query>_<suffix>.txt (suffix from --suffix, default none).
The formatted plan is the OPTIMIZED (pre-execution) physical plan; for
AQE-replanned queries the initial plan is what code review checks
(Exchange count, join strategy, PushedFilters, ReadSchema, Python eval
nodes), so this is the artifact the optimization round commits.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    out_dir = args[0]
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.1"
    only: set[str] | None = None
    suffix = ""
    for a in sys.argv[1:]:
        if a.startswith("--only="):
            only = set(a.split("=", 1)[1].split(","))
        if a.startswith("--suffix="):
            suffix = "_" + a.split("=", 1)[1]
    os.makedirs(out_dir, exist_ok=True)

    import __spark_entry__ as E
    from modal_vector_db_spark.session import get_spark

    spark = get_spark(
        "capture_plans", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    for name, fn in E.queries().items():
        if only is not None and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            path = os.path.join(out_dir, f"{name}{suffix}.txt")
            with open(path, "w") as f:
                f.write(buf.getvalue())
            print(f"wrote {path}", file=sys.stderr)
        except Exception as e:  # keep sweeping
            print(f"ERROR {name}: {e}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
