"""Deterministic WARC fixture: a gzip-per-record (Common-Crawl layout)
file of synthetic pages, with the expected parsed rows derivable on the
driver for the DuckDB oracle.

What the oracle checks is the DISTRIBUTED part — binaryFile ingest, gzip
member splitting, WARC header/HTTP-body parsing, response-type filtering —
against a driver-side expectation; the HTML→text step itself is covered by
its own unit tests (tests/test_warc.py), so sharing html_to_text between
both sides does not make the record plumbing circular."""

from __future__ import annotations

import gzip
import os

WARC_FIXTURE_PATH = "/tmp/ner_spark_warc_fixture"

_WORDS = ("spark stream window merge filter vector hash customer "
          "alpha beta gamma delta").split()


def _record(url: str, body: bytes, wtype: str = "response") -> bytes:
    http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
    head = (f"WARC/1.0\r\n"
            f"WARC-Type: {wtype}\r\n"
            f"WARC-Target-URI: {url}\r\n"
            f"WARC-Date: 2024-03-01T12:00:00Z\r\n"
            f"Content-Length: {len(http)}\r\n").encode()
    return head + b"\r\n" + http + b"\r\n\r\n"


def _pages() -> list[tuple[str, str]]:
    out = []
    for i in range(24):
        words = [_WORDS[(i * 5 + j) % len(_WORDS)] for j in range(6 + i % 5)]
        out.append((f"http://w{i:02d}.example/page", " ".join(words)))
    return out


def warc_blob() -> bytes:
    """Gzip-member-per-record blob; every 5th record is a non-response
    (request) record that the reader must drop."""
    parts = []
    for i, (url, text) in enumerate(_pages()):
        body = f"<html><body><p>{text}</p></body></html>".encode()
        wtype = "request" if i % 5 == 4 else "response"
        parts.append(gzip.compress(_record(url, body, wtype)))
    return b"".join(parts)


def expected_rows() -> list[tuple[str, str]]:
    """(url, extracted_text) for response records, via the same
    html_to_text the reader uses (see module docstring)."""
    from ner_spark.io.warc import html_to_text

    out = []
    for i, (url, text) in enumerate(_pages()):
        if i % 5 == 4:
            continue
        html = f"<html><body><p>{text}</p></body></html>"
        out.append((url, html_to_text(html)))
    return out


def ensure_warc_fixture(path: str = WARC_FIXTURE_PATH) -> str:
    """Write the fixture file once (idempotent, content deterministic)."""
    os.makedirs(path, exist_ok=True)
    f = os.path.join(path, "fixture.warc.gz")
    blob = warc_blob()
    fresh = False
    if os.path.exists(f):
        with open(f, "rb") as fh:  # content compare, not size — a stale
            fresh = fh.read() == blob  # file must never shadow new fixtures
    if not fresh:
        tmp = f"{f}.tmp.{os.getpid()}"
        with open(tmp, "wb") as fh:
            fh.write(blob)
        os.replace(tmp, f)  # atomic — concurrent harness runs can't race
    return path


def expected_values_sql() -> str:
    def esc(s: str) -> str:
        return s.replace("'", "''")

    vals = ", ".join(f"('{esc(u)}', '{esc(t)}')" for u, t in expected_rows())
    return f"(VALUES {vals}) AS w(url, text)"
