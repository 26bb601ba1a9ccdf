"""Plan audit: sweep every registered query's executed physical plan for
scale anti-patterns.  Complements tests/test_plans.py (which pins specific
plans) with a blanket check across the whole inventory.

Flags:
- CartesianProduct          — un-broadcast cross join: O(n*m) at scale
- BatchEvalPython           — row-at-a-time Python UDF in the plan (Arrow
                              variants ArrowEvalPython / MapInPandas /
                              FlatMapGroupsInPandas are allowed)
- global Sort without limit — a full sort that isn't TakeOrderedAndProject
                              and doesn't feed a window/groupBy (top-k
                              should never global-sort)

Usage: python tools/plan_audit.py [sf_dir]
Exit code 1 if any un-waived flag fires.
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

#: query → flags that are intentional there (with the reason documented).
WAIVERS: dict[str, set[str]] = {
    # broadcast-side crossJoin of a tiny query set / scalar aggregate is the
    # intended plan (the big side never shuffles)
    "ann_topk_multi": {"CartesianProduct"},
    "q22_idle_customers": {"CartesianProduct"},
}


def audit(name: str, df) -> list[str]:
    plan = df._jdf.queryExecution().executedPlan().toString()
    flags = []
    if "CartesianProduct" in plan:
        flags.append("CartesianProduct")
    # BatchEvalPython = pickled row-at-a-time UDF; Arrow variants are fine
    if re.search(r"\bBatchEvalPython\b", plan):
        flags.append("BatchEvalPython")
    # Global sort that isn't a bounded top-k: Sort [..] true (global) with no
    # TakeOrderedAndProject in the same plan and no window above it
    if re.search(r"\bSort \[[^\]]*\], true", plan) and "TakeOrderedAndProject" not in plan:
        if "Window" not in plan and "SortMergeJoin" not in plan:
            flags.append("global-sort-no-limit")
    return [f for f in flags if f not in WAIVERS.get(name, set())]


def main() -> int:
    import __spark_entry__ as E
    from modal_vector_db_spark.session import get_spark

    spark = get_spark("plan_audit", extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    bad = 0
    for name, fn in E.queries().items():
        try:
            flags = audit(name, fn(spark, SF_DIR))
        except Exception as e:  # noqa: BLE001
            print(f"ERROR {name}: {e}")
            bad += 1
            continue
        if flags:
            print(f"FLAG  {name}: {', '.join(flags)}")
            bad += 1
        else:
            print(f"ok    {name}")
    print(f"\n{bad} flagged")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
