"""WARC source (sources/warc.py): record walking by Content-Length (magic
poison in payloads), multi-member gzip, HTTP unwrap, type-filter pushdown,
error modes, and the distributed reader end-to-end."""

from __future__ import annotations

import gzip
import os

import pytest

from modal_vector_db_spark.sources.warc import (
    _decompress,
    build_record,
    iter_warc_records,
    read_warc,
)


def _http(body: bytes, status: int = 200, ctype: bytes = b"text/html") -> bytes:
    return (
        b"HTTP/1.1 %d OK\r\nContent-Type: %s\r\nContent-Length: %d\r\n\r\n"
        % (status, ctype, len(body))
        + body
    )


def test_record_roundtrip():
    rec = build_record(
        "response",
        _http(b"<p>hi</p>"),
        target_uri="http://x.com/a",
        record_id="<urn:uuid:1>",
        content_type="application/http; msgtype=response",
    )
    rows = list(iter_warc_records(rec))
    assert len(rows) == 1
    r = rows[0]
    assert r["warc_type"] == "response"
    assert r["target_uri"] == "http://x.com/a"
    assert r["record_id"] == "<urn:uuid:1>"
    assert r["http_status"] == 200
    assert r["http_content_type"] == "text/html"
    assert r["payload"] == b"<p>hi</p>"
    assert r["content_length"] == len(_http(b"<p>hi</p>"))


def test_payload_magic_poison():
    """A payload containing the record magic must not desync the walker —
    boundaries come from Content-Length arithmetic only."""
    poison = b"WARC/1.0\r\nWARC-Type: fake\r\nContent-Length: 999999\r\n\r\n"
    recs = build_record("resource", poison, target_uri="http://p.com") + build_record(
        "resource", b"second", target_uri="http://q.com"
    )
    rows = list(iter_warc_records(recs))
    assert [r["target_uri"] for r in rows] == ["http://p.com", "http://q.com"]
    assert rows[0]["payload"] == poison


def test_types_filter_skips_other_records():
    recs = (
        build_record("warcinfo", b"software: x\r\n")
        + build_record("request", _http(b""), target_uri="http://x.com")
        + build_record("response", _http(b"body"), target_uri="http://x.com",
                       content_type="application/http; msgtype=response")
    )
    rows = list(iter_warc_records(recs, types=("response",)))
    assert len(rows) == 1 and rows[0]["payload"] == b"body"
    # no filter -> all three, non-HTTP payloads passed through raw
    rows = list(iter_warc_records(recs))
    assert [r["warc_type"] for r in rows] == ["warcinfo", "request", "response"]
    assert rows[0]["http_status"] is None


def test_non_http_response_payload_surfaces_raw():
    """A response record whose block is not an HTTP message (truncated
    capture) is surfaced raw, not dropped."""
    rec = build_record(
        "response", b"not-http", target_uri="http://x.com",
        content_type="application/http; msgtype=response",
    )
    (r,) = iter_warc_records(rec)
    assert r["http_status"] is None and r["payload"] == b"not-http"


def test_truncated_record_fail_and_skip():
    good = build_record("resource", b"abc", target_uri="http://ok.com")
    torn = build_record("resource", b"full-payload")[:-12]  # overruns file end
    data = good + torn
    with pytest.raises(ValueError, match="truncated"):
        list(iter_warc_records(data, "f.warc"))
    rows = list(iter_warc_records(data, "f.warc", on_error="skip"))
    assert len(rows) == 1 and rows[0]["payload"] == b"abc"


def test_malformed_header_modes():
    with pytest.raises(ValueError, match="version line"):
        list(iter_warc_records(b"NOT-WARC\r\n\r\n"))
    assert list(iter_warc_records(b"NOT-WARC\r\n\r\n", on_error="skip")) == []
    no_len = b"WARC/1.0\r\nWARC-Type: resource\r\n\r\n"
    with pytest.raises(ValueError, match="Content-Length"):
        list(iter_warc_records(no_len))
    with pytest.raises(ValueError, match="on_error"):
        list(iter_warc_records(b"", on_error="explode"))


def test_multi_member_gzip_decompress():
    a, b = build_record("resource", b"A" * 100), build_record("resource", b"B")
    blob = gzip.compress(a, mtime=0) + gzip.compress(b, mtime=0)  # 2 members
    assert _decompress(blob) == a + b
    assert _decompress(a) == a  # plain passthrough
    rows = list(iter_warc_records(_decompress(blob)))
    assert [r["payload"][:1] for r in rows] == [b"A", b"B"]


def test_read_warc_distributed(spark, tmp_path):
    """End-to-end through binaryFile + mapInPandas: mixed plain/gz shards,
    type pushdown, field fidelity."""
    recs = []
    for i in range(6):
        recs.append(
            build_record(
                "response",
                _http(b"doc-%d" % i),
                target_uri=f"http://x.com/{i}",
                content_type="application/http; msgtype=response",
            )
        )
    with open(os.path.join(tmp_path, "a.warc"), "wb") as f:
        f.write(b"".join(recs[:3]))
    with open(os.path.join(tmp_path, "b.warc.gz"), "wb") as f:
        f.write(b"".join(gzip.compress(r, mtime=0) for r in recs[3:]))
    with open(os.path.join(tmp_path, "ignored.txt"), "wb") as f:
        f.write(b"not a warc")  # pathGlobFilter must prune it
    df = read_warc(spark, str(tmp_path), types=("response",))
    rows = {r["target_uri"]: r for r in df.collect()}
    assert len(rows) == 6
    for i in range(6):
        r = rows[f"http://x.com/{i}"]
        assert bytes(r["payload"]) == b"doc-%d" % i
        assert r["http_status"] == 200
        assert r["warc_type"] == "response"
    with pytest.raises(ValueError, match="on_error"):
        read_warc(spark, str(tmp_path), on_error="nope")
