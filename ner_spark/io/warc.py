"""WARC source + HTML→text extraction — the Common-Crawl-native input path.

``read_warc`` loads WARC (Web ARChive, ISO 28500) files into the pages
schema of BASELINE.json's input_hint: one row per ``response`` record with
``(url, warc_ts, html, text, lang)``; ``text`` comes from
:func:`html_to_text`.  Records are parsed executor-side from Spark's
``binaryFile`` source (one task per WARC file — the standard first-stage
granularity; CC segment files are ~1 GB, sized to a task).  Gzip members
(the usual CC layout: each record its own gzip member) and plain
concatenated records are both handled.

The reference consumes pre-extracted plain text (ner.py:857-866); this
module supplies the upstream step so a crawl can be taken end-to-end.
"""

from __future__ import annotations

import html as _html
import io
import re
import zlib
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PAGES_SCHEMA = ("url string, warc_ts timestamp, html binary, "
                "text string, lang string")

_SCRIPT_RE = re.compile(
    r"(?is)<(script|style|noscript)\b.*?</\1\s*>")
_COMMENT_RE = re.compile(r"(?s)<!--.*?-->")
_BLOCK_RE = re.compile(
    r"(?i)</?(?:p|div|br|h[1-6]|li|ul|ol|tr|td|th|table|section|article"
    r"|header|footer|blockquote|pre|form)\b[^>]*>")
_TAG_RE = re.compile(r"(?s)<[^>]+>")
_WS_RE = re.compile(r"[ \t\r\f\v]+")
_NL_RE = re.compile(r"\n{3,}")


def html_to_text(raw: str) -> str:
    """Deterministic tag-strip extraction: drop script/style/comments, turn
    block-level tags into newlines, strip remaining tags, decode entities,
    collapse whitespace.  (A codec-grade extractor like trafilatura would
    slot in here; not available in this image.)"""
    s = _SCRIPT_RE.sub(" ", raw)
    s = _COMMENT_RE.sub(" ", s)
    s = _BLOCK_RE.sub("\n", s)
    s = _TAG_RE.sub(" ", s)
    s = _html.unescape(s)
    s = _WS_RE.sub(" ", s)
    s = "\n".join(line.strip() for line in s.split("\n"))
    s = _NL_RE.sub("\n\n", s)
    return s.strip()


def _split_gzip_members(blob: bytes) -> bytes:
    """Decompress possibly-multi-member gzip, else return as-is.

    Real crawl segments contain truncated/corrupt members (killed
    fetchers, partial uploads); an executor task must SALVAGE the bytes
    decompressed so far rather than die — whole records beyond the bad
    member are lost with the standard stream semantics, never the task."""
    if blob[:2] != b"\x1f\x8b":
        return blob
    # member-by-member via zlib (wbits=31 = one gzip member): GzipFile
    # buffers across members inside one read() call and DISCARDS that
    # buffer when the broken member raises — member granularity keeps
    # every completed member.
    out = io.BytesIO()
    rest = blob
    while rest[:2] == b"\x1f\x8b":
        d = zlib.decompressobj(wbits=31)
        try:
            chunk = d.decompress(rest)
        except zlib.error:
            break  # corrupt member: keep prior members, drop the tail
        if not d.eof:
            break  # truncated member (no error, just incomplete)
        out.write(chunk)
        rest = d.unused_data
    return out.getvalue()


def parse_warc_records(blob: bytes) -> Iterator[dict]:
    """Yield dicts for each ``WARC-Type: response`` record: url, ts (ISO
    string), payload bytes (HTTP body with headers stripped)."""
    data = _split_gzip_members(blob)
    pos = 0
    n = len(data)
    while pos < n:
        head_start = data.find(b"WARC/1.", pos)
        if head_start == -1:
            break
        head_end = data.find(b"\r\n\r\n", head_start)
        if head_end == -1:
            break
        headers: dict[str, str] = {}
        for line in data[head_start:head_end].split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().decode("latin-1").lower()] = \
                v.strip().decode("latin-1")
        try:
            length = int(headers.get("content-length", "0"))
        except ValueError:
            break
        body_start = head_end + 4
        body = data[body_start:body_start + length]
        pos = body_start + length
        if headers.get("warc-type") != "response":
            continue
        # strip the HTTP response header block if present
        if body[:5] in (b"HTTP/",):
            split = body.find(b"\r\n\r\n")
            if split != -1:
                body = body[split + 4:]
        yield {
            "url": headers.get("warc-target-uri", ""),
            "ts": headers.get("warc-date", ""),
            "payload": body,
        }


def read_warc(spark: SparkSession, path: str, lang: str = "en") -> DataFrame:
    """WARC files under ``path`` → pages DataFrame (input_hint schema)."""
    import pandas as pd

    files = spark.read.format("binaryFile") \
        .option("pathGlobFilter", "*.warc*").load(path) \
        .select("path", "content")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"url": [], "warc_ts": [], "html": [], "text": []}
            for blob in pdf["content"]:
                for rec in parse_warc_records(bytes(blob)):
                    html_str = rec["payload"].decode("utf-8", errors="replace")
                    rows["url"].append(rec["url"])
                    rows["warc_ts"].append(
                        pd.Timestamp(rec["ts"]) if rec["ts"] else pd.NaT)
                    rows["html"].append(rec["payload"])
                    rows["text"].append(html_to_text(html_str))
            yield pd.DataFrame(rows)

    out = files.mapInPandas(
        fn, schema="url string, warc_ts timestamp, html binary, text string")
    return out.withColumn("lang", F.lit(lang))
