"""N-gram language-model scoring — the CCNet-style perplexity signal
(Wenzek et al. 2020, arXiv:1911.00359 §3.3: bucket documents by LM
perplexity and keep/weight the fluent ones).  CCNet uses a pre-trained
KenLM; with no model deps available the honest distributed equivalent is
an add-α-smoothed bigram LM trained ON THE CORPUS ITSELF in one pass —
the self-perplexity signal that flags out-of-distribution/gibberish docs
relative to the corpus.

Scale shape: two grouped counts over the exploded bigram stream (partial
aggregation — the classic word-count shuffle), one tiny broadcast (the
vocabulary scalar), then the per-doc average is a join back onto the same
stream keyed by (w1, w2)/(w1) — sort-merge under AQE, never all-pairs.
No Python anywhere: tokenize/zip/explode/ln are all codegen expressions.

Float parity: counts and the vocabulary size are exact integers on both
engines, ``ln`` matches DuckDB to well under the rounding grain (the BM25
idf relies on the same), and the per-doc mean is rounded to 5dp before
any comparison/thresholding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from modal_vector_db_spark.functions.text import tokens


def bigram_logprob(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.5,
) -> DataFrame:
    """Per-document average bigram log-probability under the corpus's own
    add-α-smoothed bigram LM:  score(d) = mean over d's bigrams of
    ln((C(w1,w2) + α) / (C(w1) + α·V)) — higher = more typical of the
    corpus.  Returns (id_col, bigram_lp rounded 5dp); documents with
    fewer than two tokens produce no row (no bigrams — callers left-join
    and treat NULL as unscorable)."""
    t = tokens(F.col(text_col))
    n1 = F.greatest(F.size(t) - 1, F.lit(0))
    bg = docs.select(
        id_col,
        F.explode(
            F.arrays_zip(
                F.slice(t, 1, n1).alias("w1"), F.slice(t, 2, n1).alias("w2")
            )
        ).alias("b"),
    ).select(id_col, F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    c2 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).cast("double").alias("c2"))
    c1 = bg.groupBy("w1").agg(F.count(F.lit(1)).cast("double").alias("c1"))
    vocab = docs.select(F.explode(t).alias("w")).agg(
        F.countDistinct("w").cast("double").alias("v")
    )
    return (
        bg.join(c2, ["w1", "w2"])
        .join(c1, "w1")
        .crossJoin(F.broadcast(vocab))
        .groupBy(id_col)
        .agg(
            F.round(
                F.avg(
                    F.log(
                        (F.col("c2") + F.lit(alpha))
                        / (F.col("c1") + F.lit(alpha) * F.col("v"))
                    )
                ),
                5,
            ).alias("bigram_lp")
        )
    )


def corpus_bigram_stats(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """The LM's training-corpus totals as one row: (n_bigrams, vocab) —
    integers, the cheap cross-engine check of the counting layer."""
    t = tokens(F.col(text_col))
    nb = docs.select(F.greatest(F.size(t) - 1, F.lit(0)).alias("nb")).agg(
        # coalesce: sum over zero rows is NULL, but the oracle's count(*)
        # formulation is 0 — the operator must be a total function
        F.coalesce(F.sum("nb"), F.lit(0)).cast("long").alias("n_bigrams")
    )
    v = docs.select(F.explode(t).alias("w")).agg(
        F.countDistinct("w").cast("long").alias("vocab")
    )
    # two scalar aggregates — never a collect_list of the whole corpus
    return nb.crossJoin(v)
