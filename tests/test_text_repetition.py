"""Direct value tests for the Gopher-style repeated-content signals
(functions/text.py:dup_ngram_frac / top_token_frac) — the cross-engine
oracle (text_profile) checks them at corpus scale; these pin hand-computed
values on planted shapes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from modal_vector_db_spark.functions.text import dup_ngram_frac, top_token_frac


@pytest.fixture(scope="module")
def profiled(spark):
    rows = [
        ("uniform", "a b c d"),
        ("all_same", "a a a a"),
        ("loop", "stop loop loop loop loop loop loop"),
        ("short", "x"),
        ("empty", ""),
    ]
    df = spark.createDataFrame(rows, "tag string, text string").select(
        "tag",
        dup_ngram_frac("text", 3).alias("dup3"),
        top_token_frac("text").alias("top"),
    )
    return {r["tag"]: r for r in df.collect()}


def test_top_token_frac(profiled):
    assert profiled["uniform"]["top"] == 0.25
    assert profiled["all_same"]["top"] == 1.0
    assert profiled["loop"]["top"] == pytest.approx(6 / 7, abs=1e-6)
    assert profiled["short"]["top"] == 1.0
    assert profiled["empty"]["top"] == 0.0


def test_dup_ngram_frac(profiled):
    # "a b c d": trigrams (a b c), (b c d) — all distinct
    assert profiled["uniform"]["dup3"] == 0.0
    # "a a a a": trigrams (a a a) x2 — one distinct of two
    assert profiled["all_same"]["dup3"] == 0.5
    # "stop loop*6": 5 trigrams, (loop loop loop) x4 -> 2 distinct of 5
    assert profiled["loop"]["dup3"] == pytest.approx(1 - 2 / 5, abs=1e-6)
    # fewer than n tokens: single fold shingle, nothing can repeat
    assert profiled["short"]["dup3"] == 0.0
    assert profiled["empty"]["dup3"] == 0.0
