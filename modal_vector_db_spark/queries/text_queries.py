"""Text-analysis pipeline queries over ``documents`` — language ID, quality
scoring, token counting, fingerprinting (the LLM-training-data extension
surface; the reference's only text op is embedding, ``embedders.py``).

Every heuristic is a pure Catalyst expression with an exact DuckDB
transliteration, so these are strong oracle checks of the whole
expression pipeline, not just row plumbing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from modal_vector_db_spark.functions import text as T
from modal_vector_db_spark.harness import load, register


@register(
    "text_profile",
    oracle=f"""
    SELECT doc_id,
           {T.token_count_sql('text')} AS n_tokens,
           {T.bpe_ish_token_count_sql('text')} AS n_bpe_ish,
           {T.language_id_sql('text')} AS lang_pred,
           round({T.quality_score_sql('text')}, 6) AS quality,
           {T.fingerprint_sql('text')} AS fp
    FROM documents
    """,
)
def text_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full per-document text-analysis profile in ONE scan: whitespace +
    BPE-ish regex token counts, stopword-overlap language ID, composite
    quality score (length/alpha-ratio/repetition), and the
    sorted-distinct-token md5 fingerprint.  All pure Catalyst expressions in
    one codegen stage — the shape of a corpus-annotation pass at 100 TB
    (one read, five derived columns, no shuffle)."""
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        T.token_count("text").alias("n_tokens"),
        T.bpe_ish_token_count("text").alias("n_bpe_ish"),
        T.language_id("text").alias("lang_pred"),
        F.round(T.quality_score("text"), 6).alias("quality"),
        T.fingerprint("text").alias("fp"),
    )


@register(
    "text_quality_filtered_agg",
    oracle=f"""
    SELECT lang, count(*) AS n, round(avg({T.token_count_sql('text')}), 6) AS avg_tokens
    FROM documents
    WHERE {T.quality_score_sql('text')} > 0.5
    GROUP BY lang
    """,
)
def text_quality_filtered_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline composition: quality filter → group stats (the shape of a
    corpus-pruning job; everything stays in one codegen stage pre-shuffle)."""
    docs = load(spark, sf_dir, "documents")
    return (
        docs.filter(T.quality_score("text") > 0.5)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg(T.token_count("text")), 6).alias("avg_tokens"),
        )
    )
