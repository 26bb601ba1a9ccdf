"""URL normalization (functions/url.py): rule-by-rule expectations, NULL
propagation, case preservation where it matters, and the documented
NOT-done list (non-default ports, path case, query order untouched)."""

from __future__ import annotations

from modal_vector_db_spark.functions.url import url_normalize


CASES = [
    # (input, expected)
    ("HTTP://Site5.Example.COM:80/p3?q=2&utm_source=feed#sec1",
     "http://site5.example.com/p3?q=2"),
    ("https://A.B.C:443/Path/Sub/", "https://a.b.c/Path/Sub"),
    ("http://x.com/p?utm_campaign=z", "http://x.com/p"),
    ("http://x.com/p?a=1&utm_medium=m&b=2", "http://x.com/p?a=1&b=2"),
    ("  http://y.com/  ", "http://y.com"),
    ("http://x.com/?fbclid=abc", "http://x.com"),
    ("no-scheme/path?utm_source=s#f", "no-scheme/path"),
    ("http://x.com:8080/p", "http://x.com:8080/p"),   # non-default port kept
    ("HTTPS://H.COM/UPPER/Path", "https://h.com/UPPER/Path"),  # path case kept
    ("http://x.com/p?b=2&a=1", "http://x.com/p?b=2&a=1"),  # order untouched
    # tracking-key BOUNDARY cases (round-8 verdict #1): a key that merely
    # CONTAINS a tracking key, and a path segment that contains 'utm_x=',
    # must pass through untouched — only whole ?/&-separated params match
    ("http://a.com/?xgclid=5", "http://a.com/?xgclid=5"),
    ("http://a.com/autm_b=c/page?x=2", "http://a.com/autm_b=c/page?x=2"),
    ("http://a.com/utm_tips=1/page?x=2", "http://a.com/utm_tips=1/page?x=2"),
    ("http://x.com/p?utm_a=1&utm_b=2&utm_c=3", "http://x.com/p"),
    ("http://x.com/p?utm_a=1&x=2", "http://x.com/p?x=2"),
    ("http://x.com/p?a=1&utm_b=2&utm_c=3&b=4", "http://x.com/p?a=1&b=4"),
    (None, None),
]


def test_url_normalize_rules(spark):
    df = spark.createDataFrame([(c,) for c, _ in CASES], "u string")
    got = [r["n"] for r in df.select(url_normalize("u").alias("n")).collect()]
    for (src, want), g in zip(CASES, got):
        assert g == want, (src, g, want)


def test_url_normalize_matches_duckdb_twin(spark):
    """The SQL fragment in functions/url.py must stay behaviorally welded
    to the Catalyst chain — run BOTH over the case table."""
    import duckdb

    from modal_vector_db_spark.functions.url import url_normalize_sql

    con = duckdb.connect()
    sql = url_normalize_sql("u")
    for src, want in CASES:
        got = con.execute(f"select {sql} from (select ? as u)", [src]).fetchone()[0]
        assert got == want, (src, got, want)
