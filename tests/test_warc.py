"""WARC source: record parsing (plain + gzip-per-record), HTML→text
extraction, end-to-end into the KG pipeline."""

import gzip

import pytest

from ner_spark.io.warc import html_to_text, parse_warc_records, read_warc


def _warc_record(url: str, body: bytes, ts: str = "2024-03-01T12:00:00Z",
                 wtype: str = "response") -> bytes:
    http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
    head = (f"WARC/1.0\r\n"
            f"WARC-Type: {wtype}\r\n"
            f"WARC-Target-URI: {url}\r\n"
            f"WARC-Date: {ts}\r\n"
            f"Content-Length: {len(http)}\r\n").encode()
    return head + b"\r\n" + http + b"\r\n\r\n"


HTML = (b"<html><head><title>T</title><script>var x=1;</script>"
        b"<style>p{}</style></head><body><h1>George Washington</h1>"
        b"<!-- hidden --><p>He was a famous president &amp; general.</p>"
        b"<div>Second block</div></body></html>")


def test_html_to_text():
    text = html_to_text(HTML.decode())
    assert "George Washington" in text
    assert "famous president & general" in text
    assert "var x=1" not in text and "hidden" not in text
    assert "\n" in text  # block tags became newlines


def test_parse_plain_records():
    blob = (_warc_record("http://a.example/", b"<p>alpha</p>")
            + _warc_record("http://b.example/", b"<p>beta</p>",
                           wtype="request")
            + _warc_record("http://c.example/", b"<p>gamma</p>"))
    recs = list(parse_warc_records(blob))
    assert [r["url"] for r in recs] == ["http://a.example/", "http://c.example/"]
    assert recs[0]["payload"] == b"<p>alpha</p>"  # HTTP headers stripped


def test_parse_gzip_members():
    blob = (gzip.compress(_warc_record("http://a.example/", HTML))
            + gzip.compress(_warc_record("http://b.example/", b"<i>x</i>")))
    recs = list(parse_warc_records(blob))
    assert len(recs) == 2
    assert recs[1]["payload"] == b"<i>x</i>"


def test_read_warc_to_pipeline(spark, artifacts, tmp_path):
    from ner_spark.pipeline.ner import extract_mentions

    wpath = tmp_path / "seg-00000.warc.gz"
    wpath.write_bytes(
        gzip.compress(_warc_record("http://a.example/", HTML))
        + gzip.compress(_warc_record("http://b.example/",
                                     b"<p>Nothing notable</p>")))
    pages = read_warc(spark, str(tmp_path))
    rows = {r.url: r for r in pages.collect()}
    assert set(rows) == {"http://a.example/", "http://b.example/"}
    assert rows["http://a.example/"].warc_ts.year == 2024
    assert b"<h1>" in bytes(rows["http://a.example/"].html)
    assert rows["http://a.example/"].lang == "en"

    mentions = extract_mentions(pages, artifacts).collect()
    # the synthetic KB holds a "Washington" geo entity; the extracted text
    # must surface it from the HTML-derived page
    hits = [m for m in mentions if m.url == "http://a.example/"]
    assert any("Washington" in m.text for m in hits)
    assert not any(m.url == "http://b.example/" for m in mentions)


def test_truncated_gzip_member_salvages_prefix():
    """A truncated trailing gzip member must not raise: records from the
    intact members are yielded, the broken tail is dropped."""
    good1 = gzip.compress(_warc_record("http://a.example/", HTML))
    good2 = gzip.compress(_warc_record("http://b.example/", HTML))
    broken = gzip.compress(_warc_record("http://c.example/", HTML))[:40]
    recs = list(parse_warc_records(good1 + good2 + broken))
    assert [r["url"] for r in recs] == ["http://a.example/",
                                       "http://b.example/"]


def test_non_response_and_garbage_records_skipped():
    blob = (_warc_record("http://req.example/", b"GET / HTTP/1.1",
                         wtype="request")
            + b"garbage bytes that are not a record at all\r\n"
            + _warc_record("http://ok.example/", HTML)
            + _warc_record("http://meta.example/", b"{}", wtype="metadata"))
    recs = list(parse_warc_records(blob))
    assert [r["url"] for r in recs] == ["http://ok.example/"]


def test_bad_content_length_stops_without_raising():
    bad = (b"WARC/1.0\r\nWARC-Type: response\r\n"
           b"WARC-Target-URI: http://x/\r\nContent-Length: NaN\r\n\r\nbody")
    assert list(parse_warc_records(
        _warc_record("http://first.example/", HTML) + bad)) != []
    assert [r["url"] for r in parse_warc_records(bad)] == []
