"""Multimodal column queries — binary blobs synthesized from ``documents``
(``encode(text)``) so both engines see identical bytes; the Spark side runs
the real ``mapInPandas`` plumbing with the deterministic stub decoder.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from modal_vector_db_spark.harness import load, register
from modal_vector_db_spark.operators.multimodal import extract_media_features


def _media_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → (doc_id, media_type, blob) with blob = utf8 bytes of text
    (the fixture set has no real media; bytes are bytes to the plumbing)."""
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 2 == 0, F.lit("image")).otherwise(F.lit("video")).alias(
            "media_type"
        ),
        F.encode("text", "UTF-8").alias("blob"),
    )


@register(
    "multimodal_checksum",
    oracle="""
    SELECT doc_id,
           CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'video' END AS media_type,
           length(text)::BIGINT AS n_bytes,
           sha256(text) AS checksum
    FROM documents
    """,
)
def multimodal_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column metadata pass (JVM-native, no Python): byte length +
    sha256 — the always-available part of media feature extraction."""
    m = _media_df(spark, sf_dir)
    return m.select(
        "doc_id",
        "media_type",
        F.length("blob").cast("long").alias("n_bytes"),
        F.sha2("blob", 256).alias("checksum"),
    )


@register(
    "multimodal_features",
    oracle="""
    SELECT doc_id,
           length(text)::BIGINT AS n_bytes,
           sha256(text) AS checksum,
           (64 + (('0x' || substr(md5(text), 1, 2))::INT % 192))::INT AS width
    FROM documents WHERE doc_id % 2 = 0
    """,
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full mapInPandas decode pipeline (stub decoder) on image rows.

    The oracle independently recomputes the stub's width formula
    (md5-first-byte derived), so this checks the Arrow batch plumbing
    end-to-end, not just row counts."""
    m = _media_df(spark, sf_dir).filter(F.col("media_type") == "image")
    feats = extract_media_features(m)
    return feats.select("doc_id", "n_bytes", "checksum", "width")


@register(
    "multimodal_frame_sample",
    oracle="""
    WITH v AS (
      SELECT doc_id,
             1 + (('0x' || substr(md5(text), 5, 2))::INT % 120) AS n_frames
      FROM documents WHERE doc_id % 2 = 1
    )
    SELECT doc_id, unnest(generate_series(0, n_frames - 1, 30)) AS frame_idx FROM v
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling explode shape on video rows (every 30th fake frame)."""
    from modal_vector_db_spark.operators.multimodal import frame_sample_stub

    m = _media_df(spark, sf_dir).filter(F.col("media_type") == "video")
    return frame_sample_stub(m, every_n=30)
