"""Parser-path HTML field extraction — the correctness tier above the
pure-Catalyst regex chain in ``functions/html.py`` (see that module's
docstring for the two-tier design and the regex subset's documented
limitations).

This path runs the stdlib ``html.parser.HTMLParser`` (an HTML5-ish
tokenizer: CDATA-aware — text inside ``<script>``/``<style>`` never
tokenizes as markup — full named/numeric charref table, attribute-value
quoting) over each document in ``mapInPandas``:

- Arrow-batched, one output frame per input batch — constant memory per
  task; at 100 TB this is the same per-document CPU any extraction pass
  pays, with zero shuffle (a pure map stage over the crawl scan).
- skips ``script/style/template/noscript`` subtrees, harvests ``<title>``
  text, visible text, and ``<a href>`` link targets in ONE walk.
- whitespace convention matches the Catalyst path exactly (segments join
  on a space, then squash+trim), so the two tiers agree wherever the
  regex subset is sufficient — pinned in ``tests/test_html.py``.
"""

from __future__ import annotations

import re
from collections.abc import Iterator
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import DataFrame

__all__ = ["extract_html_fields", "html_fields"]

_WS_RE = re.compile(r"\s+")


class _Extractor(HTMLParser):
    """One-pass visible-text + title + link extractor."""

    _SKIP = frozenset({"script", "style", "template", "noscript"})

    def __init__(self) -> None:
        # convert_charrefs=True folds &amp;/&#39;/... into the data stream
        # (the full stdlib entity table, a superset of the Catalyst tier's
        # core six — parity holds because the weld fixtures stay within
        # the shared subset).
        super().__init__(convert_charrefs=True)
        self._skip_depth = 0
        self._in_title = False
        self.parts: list[str] = []
        self.title_parts: list[str] = []
        self.links: list[str] = []
        self.lang: str | None = None
        self.meta_description: str | None = None

    def _attrs_of_interest(self, tag: str, attrs) -> None:
        if tag == "a":
            for k, v in attrs:
                if k == "href" and v:
                    self.links.append(v)
        elif tag == "html" and self.lang is None:
            for k, v in attrs:
                if k == "lang" and v:
                    self.lang = v
        elif tag == "meta" and self.meta_description is None:
            d = dict(attrs)
            # attribute ORDER is free in HTML — the tokenizer sees the
            # dict, unlike the Catalyst tier's name-before-content regex
            if (d.get("name") or "").lower() == "description" and d.get("content"):
                self.meta_description = d["content"]

    def handle_starttag(self, tag, attrs):
        if tag in self._SKIP:
            self._skip_depth += 1
        elif tag == "title":
            self._in_title = True
        self._attrs_of_interest(tag, attrs)

    def handle_startendtag(self, tag, attrs):  # <meta .../> void form
        self._attrs_of_interest(tag, attrs)

    def handle_endtag(self, tag):
        if tag in self._SKIP:
            self._skip_depth = max(0, self._skip_depth - 1)
        elif tag == "title":
            self._in_title = False

    def handle_data(self, data):
        if self._skip_depth:
            return
        if self._in_title:
            self.title_parts.append(data)
        # title text is ALSO document text (the Catalyst tier strips tags
        # without head-awareness, so it sees title content as text; the
        # tiers agreeing beats head-exclusion purism — documented parity)
        self.parts.append(data)


_FIELD_KEYS = ("title", "text", "links", "lang", "meta_description")


def html_fields(html: str | None) -> dict:
    """Driver/unit-level single-document extraction (the mapInPandas body
    calls exactly this).  NULL/undecodable in -> all-None fields out."""
    if html is None:
        return dict.fromkeys(_FIELD_KEYS)
    ex = _Extractor()
    try:
        ex.feed(html)
        ex.close()
    except Exception:  # malformed beyond the tokenizer: error row, not a
        return dict.fromkeys(_FIELD_KEYS)  # failed stage
    squash = lambda parts: _WS_RE.sub(" ", " ".join(parts)).strip()  # noqa: E731
    return {
        "title": squash(ex.title_parts),
        "text": squash(ex.parts),
        "links": ex.links,
        "lang": ex.lang,
        "meta_description": ex.meta_description,
    }


def _ship_by_value() -> None:
    import sys

    from modal_vector_db_spark.shipping import ship_by_value

    ship_by_value(sys.modules[__name__])


def extract_html_fields(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """(id, html string, *passthrough) -> (id, *passthrough, title, text,
    links) via one parser walk per document.  ``passthrough`` columns are
    echoed THROUGH the Arrow batch (keeping this a pure map stage — no
    re-join, hence no shuffle, to recover sibling columns downstream)."""
    _ship_by_value()
    dtypes = dict(df.dtypes)
    extra_schema = "".join(f", {c} {dtypes[c]}" for c in passthrough)
    schema = (
        f"{id_col} {dtypes[id_col]}{extra_schema}, title string, text string, "
        "links array<string>, lang string, meta_description string"
    )
    out_cols = [id_col, *passthrough, *_FIELD_KEYS]

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            fields = [html_fields(None if h is None else str(h)) for h in pdf[html_col]]
            out = pdf[[id_col, *passthrough]].copy()
            for k in _FIELD_KEYS:
                out[k] = [f[k] for f in fields]
            yield out[out_cols]

    return df.select(id_col, *passthrough, html_col).mapInPandas(_extract, schema)


def crawl_pages_to_metadata(recs: DataFrame, text_tier: str = "parser") -> DataFrame:
    """WARC response records -> one ``metadata`` JSON-text column per
    HTML page: the shared front half of ``VectorDB.load_from_warc`` and
    the streaming crawl ingest (``streaming/crawl.py``) — filter to HTML
    responses, normalize the URL (the stage-zero dedup key), extract
    title + visible text through the chosen tier, drop textless pages,
    serialize for the engine's distributed embed+insert path."""
    if text_tier not in ("parser", "catalyst"):
        raise ValueError(f"text_tier must be 'parser' or 'catalyst', got {text_tier!r}")
    from pyspark.sql import functions as F

    from modal_vector_db_spark.functions.html import html_title, html_to_text
    from modal_vector_db_spark.functions.url import url_normalize

    recs = recs.filter(
        # 2xx only: a 404/5xx/redirect body is boilerplate, not a document
        F.col("http_status").between(200, 299)
        & F.lower(F.coalesce("http_content_type", F.lit(""))).startswith("text/html")
    )
    base = recs.select(
        url_normalize("target_uri").alias("url"),
        F.col("warc_date"),
        F.col("payload").cast("string").alias("html"),
    )
    if text_tier == "parser":
        base = base.withColumn("_rid", F.monotonically_increasing_id())
        doc = extract_html_fields(
            base, html_col="html", id_col="_rid", passthrough=("url", "warc_date")
        ).select("url", "warc_date", "title", "text")
    else:
        doc = base.select(
            "url",
            "warc_date",
            html_title(F.col("html")).alias("title"),
            html_to_text(F.col("html")).alias("text"),
        )
    return doc.filter(F.length(F.coalesce("text", F.lit(""))) > 0).select(
        F.to_json(F.struct("url", "title", "text", "warc_date")).alias("metadata")
    )
