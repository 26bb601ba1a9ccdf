"""End-to-end engine round-trip as a driver-contract query (SURVEY §2.12).

Every other registered query drives operators directly; this one goes
through the PUBLIC facade the way a user of the reference would
(``vdb.py:19-68``): bulk-load a parquet corpus into a warehouse table
(S2, ``duckvdb.py:43-45``), then run the flagship filtered-KNN template
through ``VectorDB.query`` (§2.12) — so the catalog layout, the items
schema mapping, and the query template all get a hard DuckDB-oracled
correctness row instead of local-only test coverage.

The corpus is the ``embeddings`` fixture re-shaped into the items schema
(id = vec_id as text, metadata = ``{"vec_id": N}`` JSON, embedding
unchanged); the oracle recomputes the same top-10 straight from the
fixture, so a pass proves the write → catalog → read → KNN pipeline
preserved ids, metadata text, and vector values bit-for-bit.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from modal_vector_db_spark.harness import load, register
from modal_vector_db_spark.queries.vector_queries import _QV_SQL, _query_vec

_RT_CACHE: dict[tuple[int, str], object] = {}


def _roundtrip_db(spark: SparkSession, sf_dir: str):
    """Build (once per session per sf_dir) a VectorDB whose table is the
    embeddings fixture bulk-loaded through ``load_from_parquet`` (S2)."""
    from modal_vector_db_spark.engine import VectorDB

    key = (id(spark), sf_dir)
    hit = _RT_CACHE.get(key)
    if hit is not None and hit[0] is spark:
        return hit[1]
    wh = os.path.join(
        tempfile.gettempdir(), "sparkvdb_rt_wh", sf_dir.strip("/").replace("/", "_")
    )
    items_path = os.path.join(wh, "_items_src")
    items = load(spark, sf_dir, "embeddings").select(
        F.col("vec_id").cast("string").alias("id"),
        F.to_json(F.struct("vec_id")).alias("metadata"),
        F.col("embedding").cast("array<float>").alias("embedding"),
    )
    items.write.mode("overwrite").parquet(items_path)

    dim = len(_query_vec(spark, sf_dir))
    db = VectorDB(
        spark,
        "rt_items",
        embedding_dim=dim,
        warehouse=wh,
        create_new_table=True,
    )
    # exact path: the reference's default query is brute force too; the
    # IVF-indexed variant has its own entry (knn_ivf_exact).
    db.load_from_parquet(items_path, build_index=False)
    _RT_CACHE[key] = (spark, db)
    return db


@register(
    "engine_roundtrip",
    oracle=f"""
    SELECT CAST(vec_id AS VARCHAR) AS id,
           '{{"vec_id":' || vec_id || '}}' AS metadata,
           round(1 - list_cosine_similarity(embedding::DOUBLE[], {_QV_SQL}), 6) AS distance
    FROM embeddings
    ORDER BY 1 - list_cosine_similarity(embedding::DOUBLE[], {_QV_SQL}) ASC,
             CAST(vec_id AS VARCHAR) ASC
    LIMIT 10
    """,
)
def engine_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Public-API flagship: ``load_from_parquet`` → ``VectorDB.query``
    (as_dataframe, exact path, k=10) — ties pinned by id on both sides."""
    db = _roundtrip_db(spark, sf_dir)
    out = db.query(_query_vec(spark, sf_dir), k=10, as_dataframe=True)
    return out.withColumn("distance", F.round(F.col("distance"), 6))
