"""Semantic pins for the C4 / Gopher corpus-cleaning rules
(functions/text.py; C4: Raffel et al. 2020 §2.2, Gopher: Rae et al. 2021
§A1.1).  The oracle-parity gate checks cross-engine equality; these check
the rules classify hand-built structures correctly."""

from __future__ import annotations

from pyspark.sql import functions as F

from modal_vector_db_spark.functions.text import (
    c4_clean,
    c4_keep,
    c4_kept_lines,
    gopher_keep,
)


def _one(spark, text, col):
    return spark.createDataFrame([(text,)], "text string").select(
        col.alias("v")
    ).head()["v"]


def test_c4_line_filter(spark):
    text = "\n".join(
        [
            "A proper sentence with enough words.",  # kept
            "Too short.",  # dropped: 2 words
            "no terminal punctuation on this line",  # dropped: no punct
            "This site uses a cookie banner, accept?",  # dropped: boilerplate
            "Please enable javascript to continue.",  # dropped: boilerplate
            'He said the magic word "quoted speech."',  # kept: ends in "
            "",  # dropped: empty
            "Another fine closing line ends now!",  # kept
        ]
    )
    kept = _one(spark, text, c4_kept_lines("text"))
    assert kept == [
        "A proper sentence with enough words.",
        'He said the magic word "quoted speech."',
        "Another fine closing line ends now!",
    ]
    cleaned = _one(spark, text, c4_clean("text"))
    assert cleaned == "\n".join(kept)
    # all-dropped doc cleans to the EMPTY STRING (not null)
    assert _one(spark, "no punct here", c4_clean("text")) == ""


def test_c4_page_rule(spark):
    five = "One two three x. " * 5
    assert _one(spark, five, c4_keep("text"))
    assert not _one(spark, "Just one sentence.", c4_keep("text"))  # < 5
    assert not _one(spark, five + " code { block", c4_keep("text"))
    assert not _one(spark, five + " Lorem Ipsum dolor", c4_keep("text"))


def test_gopher_rules(spark):
    good = ("the cat and that dog have fun with every word here today " * 5).strip()
    assert _one(spark, good, gopher_keep("text"))
    # word count below the floor
    assert not _one(spark, "the and short", gopher_keep("text"))
    # symbol ratio: 30 '#' tokens on ~55 words blows the 0.1 threshold
    assert not _one(spark, good + " " + "# " * 30, gopher_keep("text"))
    # mean word length out of [3, 10]
    assert not _one(spark, ("a b c d e " * 12).strip() + " the and", gopher_keep("text"))
    # fewer than 2 required stop words
    no_stops = ("cat dog fun word here today runs fast " * 8).strip()
    assert not _one(spark, no_stops, gopher_keep("text"))
    # configurable floor admits short docs
    assert _one(
        spark, "the cat and dog have fun here", gopher_keep("text", min_words=5)
    )


def test_gopher_line_rules(spark):
    from modal_vector_db_spark.functions.text import gopher_lines_ok

    prose = "\n".join(["A fine line of text here."] * 10)
    assert _one(spark, prose, gopher_lines_ok("text"))
    # 10 bullets + 1 prose line = 91% bulleted -> discard
    bullets = "one prose line\n" + "\n".join(["- item"] * 10)
    assert not _one(spark, bullets, gopher_lines_ok("text"))
    # 9 bullets + 1 prose = 90% -> boundary keeps
    assert _one(spark, "one prose line\n" + "\n".join(["- item"] * 9), gopher_lines_ok("text"))
    # 4 of 10 lines end with ellipsis -> discard; 3 of 10 keeps
    assert not _one(
        spark, "\n".join(["truncated..."] * 4 + ["fine line"] * 6), gopher_lines_ok("text")
    )
    assert _one(
        spark, "\n".join(["truncated…"] * 3 + ["fine line"] * 7), gopher_lines_ok("text")
    )
    # no non-empty lines passes (other rules reject on word count)
    assert _one(spark, "", gopher_lines_ok("text"))


def test_line_rules_handle_crlf(spark):
    """CRLF documents: the line splits must strip '\\r' with the newline —
    otherwise trailing carriage returns defeat the terminal-punctuation
    and ellipsis-suffix tests and lone '\\r' segments dilute the ratios
    (review finding); both engines use the same \\r?\\n split."""
    import duckdb

    from modal_vector_db_spark.functions.text import (
        c4_clean,
        c4_clean_sql,
        gopher_lines_ok,
        gopher_lines_ok_sql,
    )

    crlf_ok = "this line has enough words.\r\nand this one also does.\r\n"
    crlf_ellipsis = "cut off here...\r\ntrailing again...\r\nmore dots...\r\n"
    rows = [("a", crlf_ok), ("b", crlf_ellipsis)]
    df = spark.createDataFrame(rows, "id string, text string")
    got = {
        r["id"]: (r["clean"], r["ok"])
        for r in df.select(
            "id",
            c4_clean("text").alias("clean"),
            gopher_lines_ok("text").alias("ok"),
        ).collect()
    }
    # CRLF lines survive the C4 terminal-punctuation rule
    assert got["a"][0].count("\n") == 1 and got["a"][0].endswith("does.")
    assert got["a"][1] is True
    # 100% ellipsis-ended CRLF lines now trip the Gopher discard
    assert got["b"][1] is False

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES ('a', ?), ('b', ?)) v(id, text)",
        [crlf_ok, crlf_ellipsis],
    )
    for _id, c, ok in con.execute(
        f"SELECT id, {c4_clean_sql('text')}, {gopher_lines_ok_sql('text')} "
        "FROM t ORDER BY id"
    ).fetchall():
        assert (c, ok) == got[_id], (_id, c, ok, got[_id])


def test_bigram_logprob_ranks_gibberish_below_typical(spark):
    """The corpus-trained bigram LM (operators/lm.py): a document made of
    the corpus's common bigrams scores HIGHER than one made of tokens that
    never co-occur; sub-2-token docs produce no row; corpus stats are
    exact."""
    from modal_vector_db_spark.operators.lm import (
        bigram_logprob,
        corpus_bigram_stats,
    )

    rows = [(i, "the cat sat on the mat " * 3) for i in range(8)]
    rows.append((100, "zqx vwk jly pnm zqx wrt"))  # never-seen bigrams
    rows.append((101, "single"))  # no bigrams -> no row
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["bigram_lp"] for r in bigram_logprob(df).collect()}
    assert 101 not in got
    assert got[100] < got[0], (got[100], got[0])
    assert all(got[i] == got[0] for i in range(8))  # identical docs, same score

    stats = corpus_bigram_stats(df).collect()[0]
    # 9 scorable docs: 8 with 18 tokens (17 bigrams) + the 6-token
    # gibberish doc (5 bigrams); vocab = {the,cat,sat,on,mat} + the 5
    # DISTINCT gibberish tokens (zqx repeats) + 'single'
    assert stats["n_bigrams"] == 8 * 17 + 5
    assert stats["vocab"] == 5 + 5 + 1
