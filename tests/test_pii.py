"""PII detection/redaction: hand-written expectations on the Spark side
(cross-engine parity is enforced by the text_profile oracle hash)."""

from __future__ import annotations

from pyspark.sql import functions as F

from modal_vector_db_spark.functions.text import pii_count, redact_pii


CASES = [
    ("mail me at bob.smith+x@corp.example.org ok", 1, "mail me at [EMAIL] ok"),
    ("server 10.1.2.3 and 192.168.0.255 up", 2, "server [IPV4] and [IPV4] up"),
    ("call +1 555-123-4567 or 555 1234", 1, "call +1 [PHONE] or 555 1234"),
    ("clean text, no pii 1.2 3.4", 0, "clean text, no pii 1.2 3.4"),
    ("a@b.co 8.8.8.8 123-456-7890", 3, "[EMAIL] [IPV4] [PHONE]"),
]


def test_pii_count_and_redaction(spark):
    df = spark.createDataFrame([(s,) for s, _, _ in CASES], ["s"])
    got = df.select(
        "s", pii_count("s").alias("n"), redact_pii("s").alias("red")
    ).collect()
    expect = {s: (n, red) for s, n, red in CASES}
    for r in got:
        n, red = expect[r["s"]]
        assert r["n"] == n, r
        assert r["red"] == red, r


def test_redaction_is_idempotent(spark):
    """Redacting already-redacted text must be a no-op (placeholders do not
    re-match any pattern) — required for safe pipeline re-runs."""
    df = spark.createDataFrame([(s,) for s, _, _ in CASES], ["s"])
    once = df.select(redact_pii("s").alias("r1"))
    twice = once.select(F.col("r1"), redact_pii("r1").alias("r2"))
    for r in twice.collect():
        assert r["r1"] == r["r2"]
