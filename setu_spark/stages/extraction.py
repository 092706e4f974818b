"""Text-extraction stage — raw crawl/OCR JSON → document table.

Rebuild of the reference's TextExtractionStage (SURVEY.md §2.1 S1-S5,
text_extraction.py):

  * the reference distributes a Python list of JSON paths into an RDD and
    reads files inside ``mapPartitionsWithIndex`` (R1, text_extraction.py:
    231) — here it's a plain schema'd ``spark.read.json`` glob: Spark
    already distributes file splits, tracks corrupt files, and prunes
    columns; re-implementing file fan-out driver-side fights the scheduler;
  * trafilatura HTML→text extraction runs inside ``mapInPandas`` (replacing
    R2) behind an import-try: the real library plugs in when present, the
    deterministic fallback (tag-strip regex) keeps the stage testable;
  * exact dedup by doc_id and the timestamp null-drop match the reference
    (text_extraction.py:164, 576).

Crawl-record schema per FIXTURES.md F1 (all strings, like the reference's
explicit all-string schema at text_extraction.py:169-182).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

CRAWL_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("url", StringType()),
        StructField("source", StringType()),
        StructField("timestamp", StringType()),
        StructField("html", StringType()),
    ]
)

EXTRACTED_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("url", StringType()),
        StructField("source", StringType()),
        StructField("timestamp", StringType()),
        StructField("text", StringType()),
        StructField("successful_extraction", StringType()),
    ]
)

_TAG = re.compile(r"<script.*?</script>|<style.*?</style>|<[^>]+>", re.S)
_WS = re.compile(r"[ \t]+")


def _fallback_extract(html: str | None) -> str | None:
    """Deterministic trafilatura stand-in: strip script/style/tags,
    collapse whitespace. Swapped out automatically when trafilatura is
    importable on the workers."""
    if html is None:
        return None
    text = _TAG.sub(" ", html)
    text = "\n".join(
        _WS.sub(" ", ln).strip() for ln in text.splitlines()
    )
    return re.sub(r"\n{2,}", "\n", text).strip() or None


#: html.parser produces a Tag only for an OPENING tag whose name starts
#: with a letter immediately after '<' (a lone end tag or '< div' does
#: not create one), so this regex mirrors the reference's
#: bool(BeautifulSoup(text, "html.parser").find()) gate closely.
_OPEN_TAG = re.compile(r"<[a-zA-Z][^>]*>")


def _is_html_impl():
    """The reference gates trafilatura on an is-this-HTML-at-all check
    (text_extraction.py:555: ``bool(BeautifulSoup(text,
    "html.parser").find())``) — plain-text rows get
    successful_extraction=False and NULL text instead of being fed to
    the extractor. Real bs4 when importable on the workers, else the
    opening-tag regex approximation above."""
    try:  # pragma: no cover - not in this container
        from bs4 import BeautifulSoup

        return lambda t: bool(
            t and BeautifulSoup(t, "html.parser").find()
        )
    except ImportError:
        return lambda t: bool(t and _OPEN_TAG.search(t))


def _extract_impl():
    """The html-extra plug point: the real trafilatura when importable
    (runs on each Python WORKER — installing the extra on the cluster is
    enough, no code change), else the deterministic stand-in. Smoke-tested
    both ways in tests/test_plug_extras.py."""
    try:  # pragma: no cover - not in this container
        import trafilatura

        return lambda h: trafilatura.extract(h) if h else None
    except ImportError:
        return _fallback_extract


def read_crawl_json(
    spark: SparkSession, path_glob: str, multiline: bool = False
) -> DataFrame:
    """S1: schema'd, corrupt-tolerant JSON scan of crawl records.

    ``multiline=False`` (default) for NDJSON shards; ``True`` for the
    reference's one-pretty-printed-object-per-file layout
    (text_extraction.py:151). NB: with multiline=True Spark parses each
    FILE as a single JSON value — the wrong setting silently truncates."""
    from setu_spark.sources.io import read_json_corpus

    return read_json_corpus(spark, path_glob, CRAWL_SCHEMA, multiline=multiline)


def extract_text(crawl: DataFrame) -> DataFrame:
    """HTML → text via Arrow-batched mapInPandas (R2 rebuilt)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ex = _extract_impl()
        is_html = _is_html_impl()
        for pdf in batches:
            # reference gate (text_extraction.py:555): only rows that
            # parse as containing an HTML element reach the extractor;
            # everything else is a failed extraction with NULL text
            text = pdf["html"].map(lambda h: ex(h) if is_html(h) else None)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "url": pdf["url"],
                    "source": pdf["source"],
                    "timestamp": pdf["timestamp"],
                    "text": text,
                    "successful_extraction": text.notna().map(
                        lambda b: "true" if b else "false"
                    ),
                }
            )

    return crawl.mapInPandas(kernel, schema=EXTRACTED_SCHEMA)


def run_extraction(
    spark: SparkSession, path_glob: str, multiline: bool = False
) -> DataFrame:
    """Full stage: scan → dedup by doc_id → extract → drop null-timestamp
    rows (reference text_extraction.py:164, 576)."""
    crawl = read_crawl_json(spark, path_glob, multiline).dropDuplicates(
        ["doc_id"]
    )
    extracted = extract_text(crawl)
    return extracted.na.drop(subset=["timestamp"])
