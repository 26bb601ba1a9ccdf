"""Similarity search: exact brute-force + scale-out ANN (IVF / LSH).

The reference's only index is an opt-in DuckDB HNSW (``duckvdb.py:37-41``);
its default query path is exact brute-force cosine.  Spark has no secondary
indexes, so the scale path re-expresses "index" as *data layout*:

- **IVF (inverted file) via MLlib KMeans**: cluster vectors; store
  ``cluster_id`` as a partition column.  A query embeds, finds its
  ``nprobe`` nearest centroids driver-side (tiny), and filters
  ``cluster_id IN (...)`` — Spark partition pruning skips everything else,
  which is exactly what an IVF index probe does.  Recall is tunable via
  nprobe; rerank within probed clusters is exact.
- **LSH via BucketedRandomProjectionLSH** on L2-normalized vectors: for unit
  vectors, ‖a−b‖² = 2−2·cos(a,b), so Euclidean LSH order == cosine order.

At 100 TB: centroids are O(k·dim) — always broadcastable; the big table is
never shuffled at query time (the layout did the shuffle once at build).
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from modal_vector_db_spark.functions.distance import cosine_distance, vector_lit


def brute_force_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k (baseline; ties broken by id for determinism).

    ``asc_nulls_last``: zero-norm/NULL embeddings yield NULL distance in
    Spark (vs NaN-sorts-last in DuckDB); keep them out of the top-k."""
    return (
        df.select(
            F.col(id_col),
            cosine_distance(F.col(vec_col), vector_lit(query_vec)).alias("distance"),
        )
        .orderBy(F.col("distance").asc_nulls_last(), F.col(id_col).asc())
        .limit(k)
    )


def brute_force_topk_multi(
    df: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
) -> DataFrame:
    """Batch top-k for MANY query vectors: broadcast the (small) query set
    against the (huge) corpus — a crossJoin that never shuffles the corpus —
    then per-query top-k via ``row_number() <= k``, which Catalyst plans
    with a **Partial-mode WindowGroupLimit** below the exchange (Spark
    3.5+): each input partition keeps only its local top-k per query
    before shuffling, so ≤ partitions×Q×k rows move, not corpus×Q.
    Plan-asserted in tests/test_plans.py."""
    from pyspark.sql.window import Window

    joined = df.crossJoin(F.broadcast(queries))
    scored = joined.select(
        F.col(q_id_col),
        F.col(id_col),
        cosine_distance(F.col(vec_col), F.col(q_vec_col)).alias("distance"),
    )
    w = Window.partitionBy(q_id_col).orderBy(
        F.col("distance").asc_nulls_last(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .drop("rank")
    )


class IVFIndex:
    """KMeans-IVF: the Spark-native analog of the HNSW index (X1)."""

    def __init__(self, centroids: np.ndarray) -> None:
        self.centroids = np.asarray(centroids, dtype=np.float64)

    @classmethod
    def build(cls, df: DataFrame, vec_col: str = "embedding", k: int = 16, seed: int = 42) -> "IVFIndex":
        """Fit KMeans on the vector column (MLlib, distributed)."""
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        feats = df.select(array_to_vector(F.col(vec_col)).alias("features"))
        model = KMeans(k=k, seed=seed, featuresCol="features").fit(feats)
        return cls(np.array([np.asarray(c) for c in model.clusterCenters()]))

    def assign(self, df: DataFrame, vec_col: str = "embedding") -> DataFrame:
        """Add ``cluster_id`` = argmin centroid cosine distance.

        Computed as a native expression over a broadcast centroid literal
        array — no Python, no shuffle (the later partitioned write is the
        one intentional shuffle)."""
        cents = F.array(*[vector_lit(c) for c in self.centroids])
        dists = F.transform(cents, lambda c: cosine_distance(F.col(vec_col), c))
        return df.withColumn("cluster_id", F.array_position(dists, F.array_min(dists)).cast("int") - 1)

    def nearest_centroids(self, query_vec: Sequence[float], nprobe: int) -> list[int]:
        q = np.asarray(query_vec, dtype=np.float64)
        qn = q / (np.linalg.norm(q) or 1.0)
        cn = self.centroids / np.maximum(
            np.linalg.norm(self.centroids, axis=1, keepdims=True), 1e-12
        )
        d = 1.0 - cn @ qn
        return [int(i) for i in np.argsort(d)[:nprobe]]

    def query(
        self,
        df_clustered: DataFrame,
        query_vec: Sequence[float],
        k: int = 10,
        nprobe: int = 4,
        vec_col: str = "embedding",
        id_col: str = "vec_id",
    ) -> DataFrame:
        """IVF probe: partition-prune to nprobe clusters, exact rerank inside.

        ``cluster_id IN (...)`` on a cluster-partitioned table hits Spark's
        partition pruning — the physical scan reads only probed partitions
        (the moral equivalent of an index lookup at any scale)."""
        probes = self.nearest_centroids(query_vec, nprobe)
        pruned = df_clustered.filter(F.col("cluster_id").isin(probes))
        return brute_force_topk(pruned, query_vec, k=k, vec_col=vec_col, id_col=id_col)

    def save(self, path: str, spark: SparkSession) -> None:
        rows = [(i, [float(x) for x in c]) for i, c in enumerate(self.centroids)]
        spark.createDataFrame(rows, "cluster_id int, centroid array<double>").coalesce(1).write.mode(
            "overwrite"
        ).parquet(path)

    @classmethod
    def load(cls, path: str, spark: SparkSession) -> "IVFIndex":
        rows = spark.read.parquet(path).orderBy("cluster_id").collect()
        return cls(np.array([r["centroid"] for r in rows]))


def cosine_lsh_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bucket_length: float = 0.5,
    num_hash_tables: int = 4,
) -> DataFrame:
    """LSH-approximate top-k via BucketedRandomProjectionLSH on normalized
    vectors (cosine ↔ Euclidean equivalence for unit vectors)."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH, Normalizer
    from pyspark.ml.functions import array_to_vector, vector_to_array

    vecs = df.select(
        F.col(id_col), array_to_vector(F.col(vec_col).cast("array<double>")).alias("raw")
    )
    normed = Normalizer(inputCol="raw", outputCol="features", p=2.0).transform(vecs)
    lsh = BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=42,
    ).fit(normed)
    q = np.asarray(query_vec, dtype=np.float64)
    q = q / (np.linalg.norm(q) or 1.0)
    from pyspark.ml.linalg import Vectors

    res = lsh.approxNearestNeighbors(normed, Vectors.dense(q), k, distCol="l2")
    # ‖a−b‖² = 2−2cos ⇒ cosine distance = l2² / 2
    return res.select(
        F.col(id_col), (F.col("l2") * F.col("l2") / 2.0).alias("distance")
    ).orderBy("distance")


def similarity_join(
    left: DataFrame,
    right: DataFrame,
    threshold: float,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bucket_length: float = 0.5,
    num_hash_tables: int = 4,
    self_join: bool | None = None,
) -> DataFrame:
    """Approximate cosine similarity join: all (left, right) pairs with
    cosine similarity >= threshold, via MLlib ``approxSimilarityJoin`` on
    L2-normalized vectors (cosine sim s ↔ Euclidean distance √(2−2s)).

    Scale shape: candidate pairs only form within shared LSH buckets —
    shuffle O(rows × tables), never the full cross product.  Returns
    (id_a, id_b, cos_sim).

    ``self_join`` (default: auto — true iff ``left is right``): when true,
    each unordered pair is emitted once as id_a < id_b (and self-pairs are
    dropped).  For genuinely distinct inputs leave it false: ids from the
    two sides are unrelated namespaces and the ordering filter would
    silently drop every match with left id >= right id.
    """
    import math

    from pyspark.ml.feature import BucketedRandomProjectionLSH, Normalizer
    from pyspark.ml.functions import array_to_vector

    def prep(df, suffix):
        vecs = df.select(
            F.col(id_col).alias(f"id{suffix}"),
            array_to_vector(F.col(vec_col).cast("array<double>")).alias("raw"),
        )
        return Normalizer(inputCol="raw", outputCol="features", p=2.0).transform(vecs)

    if self_join is None:
        self_join = left is right
    a, b = prep(left, "_a"), prep(right, "_b")
    lsh = BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=42,
    ).fit(a)
    dist_t = math.sqrt(max(0.0, 2.0 - 2.0 * threshold))
    pairs = lsh.approxSimilarityJoin(a, b, dist_t, distCol="l2")
    out = pairs.select(
        F.col("datasetA.id_a").alias("id_a"),
        F.col("datasetB.id_b").alias("id_b"),
        (1.0 - F.col("l2") * F.col("l2") / 2.0).alias("cos_sim"),
    )
    if self_join:
        out = out.filter(F.col("id_a") < F.col("id_b"))
    return out
