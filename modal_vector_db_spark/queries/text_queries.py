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


_DECON_N, _DECON_HITS = 8, 3
_BENCH_SQL = "SELECT substr(text, 1, 120) AS text FROM documents WHERE doc_id % 17 = 0"


@register(
    "text_decontaminate",
    oracle=f"""
    WITH bench AS ({_BENCH_SQL}),
    bsh AS (SELECT DISTINCT unnest({T.hashed_shingles_sql('text', _DECON_N)}) AS h
            FROM bench),
    tsh AS (SELECT doc_id, unnest({T.hashed_shingles_sql('text', _DECON_N)}) AS h
            FROM documents)
    SELECT t.doc_id, count(DISTINCT t.h) AS n_hits
    FROM tsh t JOIN bsh b ON t.h = b.h
    GROUP BY t.doc_id
    HAVING count(DISTINCT t.h) >= {_DECON_HITS}
    """,
)
def text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (operators/dedup.py:contamination_report):
    the "eval suite" is the 120-char prefix of every 17th document; training
    docs sharing ≥ 3 distinct 8-gram token shingles with it are flagged
    (doc_id, n_hits) — by construction, exactly the source docs.  The
    benchmark shingle set is distinct-ed and broadcast; the corpus is one
    scan + explode and never shuffles (only the rare hits do)."""
    from modal_vector_db_spark.operators.dedup import contamination_report

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    bench = docs.filter(F.col("doc_id") % 17 == 0).select(
        F.substring("text", 1, 120).alias("text")
    )
    return contamination_report(
        docs, bench, "doc_id", "text", shingle_n=_DECON_N, min_hits=_DECON_HITS
    )
