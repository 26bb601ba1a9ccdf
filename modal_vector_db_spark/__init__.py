"""modal_vector_db_spark — a PySpark-native analytics & vector engine.

A from-scratch, Spark-first re-implementation of the query and
data-processing capabilities of ``jesterlabs/modal-vector-db``
(reference: ``vdb.py``, ``duckvdb.py``, ``embedders.py``, ``utils.py``),
re-expressed on the Spark DataFrame/SQL stack:

- storage: Parquet directories (one per named DB) instead of DuckDB files
- query IR: Catalyst logical plans built with the DataFrame API instead of
  SQL-string splicing (reference ``duckvdb.py:63-101``)
- KNN: native column-expression cosine distance + ``TakeOrderedAndProject``
  top-k instead of ``array_cosine_distance`` + ``ORDER BY/LIMIT``
  (reference ``duckvdb.py:110-118``)
- embedders: Arrow-vectorized ``pandas_udf`` fan-out instead of per-item
  Modal RPC (reference ``vdb.py:57``)
- ANN index: KMeans-IVF partition pruning / LSH instead of DuckDB HNSW
  (reference ``duckvdb.py:37-41``)

Plus the scale-out surface a 100 TB training-data pipeline needs:
deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard /
embedding-cosine), similarity search, text analysis, multimodal column
plumbing, and Structured Streaming ingest.
"""

from modal_vector_db_spark.engine import VectorDB, Result

__all__ = ["VectorDB", "Result"]
__version__ = "0.1.0"
