"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at the given sf dir, then compares row-count + schema-ish + value
multiset (columns sorted by name, floats as-is — both sides are expected to
round explicitly).  Usage::

    python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time
import traceback

sys.path.insert(0, "/root/repo")


def duck_run(sql: str, sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con.execute(sql).fetchdf()


def canon(v):
    if v is None:
        return None
    if isinstance(v, float) and v != v:  # NaN (duckdb NULL ints surface as NaN)
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, (int, float)):
        return float(v)
    return v


def normalize(pdf):
    pdf = pdf[sorted(pdf.columns)]
    rows = [
        tuple(canon(v) for v in row) for row in pdf.itertuples(index=False, name=None)
    ]
    return sorted(rows, key=repr)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import __spark_entry__ as E
    from modal_vector_db_spark.session import get_spark

    spark = get_spark("correctness-check")
    qs, os_ = E.queries(), E.oracle_sql()
    n_pass = n_fail = n_weak = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception:
            print(f"FAIL  {name}: spark query raised")
            traceback.print_exc(limit=3)
            n_fail += 1
            continue
        if name not in os_:
            print(f"weak  {name}: rows={len(sdf)} (no oracle) [{time.time()-t0:.1f}s]")
            n_weak += 1
            continue
        try:
            odf = duck_run(os_[name], sf_dir)
        except Exception:
            print(f"FAIL  {name}: oracle raised")
            traceback.print_exc(limit=3)
            n_fail += 1
            continue
        if len(sdf) != len(odf):
            print(f"FAIL  {name}: rowcount spark={len(sdf)} duck={len(odf)}")
            n_fail += 1
            continue
        if sorted(map(str.lower, sdf.columns)) != sorted(map(str.lower, odf.columns)):
            print(
                f"FAIL  {name}: columns spark={sorted(sdf.columns)} duck={sorted(odf.columns)}"
            )
            n_fail += 1
            continue
        sn, on = normalize(sdf), normalize(odf)
        if sn == on:
            print(f"pass  {name}: rows={len(sdf)} [{time.time()-t0:.1f}s]")
            n_pass += 1
        else:
            diff = [(a, b) for a, b in zip(sn, on) if a != b][:3]
            print(f"FAIL  {name}: value mismatch, first diffs: {diff}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_weak} weak (rows-only), {n_fail} FAIL")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
