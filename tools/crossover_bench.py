"""Crossover benchmark: the same dedup pipelines on BOTH engines at 1× and
N× corpus size (replicated via disjoint-id union — no new files).

At sf0.1 the corpus is tiny (5k docs) and single-process DuckDB's ~10 ms
query floor beats Spark's ~0.5 s scheduling floor on every sub-second
query.  This tool shows the quantity that actually matters at 100 TB: the
GROWTH RATE.  Spark's wall-clock is dominated by its fixed floor (flat in
N); DuckDB's grows with the data.

Usage: python tools/crossover_bench.py [N] [sf_dir] → one JSON line.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

N = int(sys.argv[1]) if len(sys.argv) > 1 else 16
SF_DIR = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

REPL_SQL = """
SELECT doc_id + 10000000 * i AS doc_id, text
FROM read_parquet('{p}') , (SELECT unnest(generate_series(0, {k})) AS i) _r
"""


def duck_minhash(con, scale: int) -> float:
    from modal_vector_db_spark.functions.hashing import minhash_signature_from_hashes_sql
    from modal_vector_db_spark.functions.text import hashed_shingles_sql

    sh = hashed_shingles_sql("text", 3)
    sig = minhash_signature_from_hashes_sql("sh", 8)
    aug = REPL_SQL.format(p=f"{SF_DIR}/documents.parquet", k=scale - 1)
    sql = f"""
    WITH aug AS ({aug}),
    d0 AS (SELECT doc_id, {sh} AS sh FROM aug),
    d AS (SELECT doc_id, sh, {sig} AS sig FROM d0),
    bands AS (
      SELECT doc_id, sh, i AS band,
             sig[2*i + 1]::VARCHAR || '_' || sig[2*i + 2]::VARCHAR AS key
      FROM d, (SELECT unnest(generate_series(0, 3)) AS i) t),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key
                               AND a.doc_id < b.doc_id),
    verified AS (
      SELECT c.doc_a, c.doc_b,
             len(list_intersect(da.sh, db.sh))::DOUBLE
               / len(list_distinct(da.sh || db.sh))::DOUBLE AS jacc
      FROM cand c JOIN d da ON da.doc_id = c.doc_a
                  JOIN d db ON db.doc_id = c.doc_b)
    SELECT count(*) FROM verified WHERE jacc >= 0.4
    """
    t0 = time.perf_counter()
    con.execute(sql).fetchall()
    return time.perf_counter() - t0


def spark_minhash(spark, scale: int) -> float:
    from pyspark.sql import functions as F

    from modal_vector_db_spark.harness import load, scale_out
    from modal_vector_db_spark.operators.dedup import minhash_lsh_pairs

    docs = load(spark, SF_DIR, "documents").select("doc_id", "text")
    out = None
    for i in range(scale):
        c = docs.withColumn("doc_id", F.col("doc_id") + (10_000_000 * i))
        out = c if out is None else out.union(c)
    pairs = minhash_lsh_pairs(scale_out(out), "doc_id", "text", threshold=0.4)
    t0 = time.perf_counter()
    pairs.count()
    return time.perf_counter() - t0


def main() -> None:
    import duckdb
    import os

    from modal_vector_db_spark.session import get_spark

    con = duckdb.connect()
    con.execute(f"PRAGMA threads={os.environ.get('SPARK_GRAFT_CPUS', os.cpu_count() or 8)}")
    spark = get_spark("crossover", extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    out: dict[str, dict] = {"minhash_lsh": {}}
    for scale in (1, N):
        # warm both engines once, then time
        duck_minhash(con, scale)
        d = duck_minhash(con, scale)
        spark_minhash(spark, scale)
        s = spark_minhash(spark, scale)
        out["minhash_lsh"][f"x{scale}"] = {"duckdb_sec": round(d, 2), "spark_sec": round(s, 2)}
    m = out["minhash_lsh"]
    m["duck_growth"] = round(m[f"x{N}"]["duckdb_sec"] / max(m["x1"]["duckdb_sec"], 1e-9), 1)
    m["spark_growth"] = round(m[f"x{N}"]["spark_sec"] / max(m["x1"]["spark_sec"], 1e-9), 1)
    print(json.dumps({"n": N, "sf_dir": SF_DIR, "results": out}))


if __name__ == "__main__":
    main()
