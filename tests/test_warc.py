"""WARC source: record walk (plain/gzip/truncated), HTTP envelope
stripping, HTML text extraction, and the file-level binaryFile reader
(oracle parity for the registered query lives in test_oracle_parity)."""

from __future__ import annotations

import gzip
import io

from modware_loader_spark.sources import warc as W


def _record(uri: bytes, body: bytes, wtype: bytes = b"response",
            http: bool = True) -> bytes:
    payload = body
    if http:
        payload = (
            b"HTTP/1.1 404 Not Found\r\nContent-Type: text/html\r\n\r\n" + body
        )
    return (
        b"WARC/1.0\r\nWARC-Type: " + wtype + b"\r\n"
        b"WARC-Target-URI: " + uri + b"\r\n"
        b"Content-Length: " + str(len(payload)).encode() + b"\r\n\r\n"
        + payload + b"\r\n\r\n"
    )


def test_parse_warc_multi_record_plain_and_gzip():
    blob = _record(b"http://a", b"<p>A</p>") + _record(
        b"http://b", b"ignored", wtype=b"request", http=False
    ) + _record(b"http://c", b"<p>C</p>")
    for wrap in (lambda b: b, None):
        if wrap is None:
            # one gzip member per record — the standard crawl layout
            parts = []
            for rec in (blob[: len(blob)],):
                pass
            members = b""
            for r in (_record(b"http://a", b"<p>A</p>"),
                      _record(b"http://b", b"ignored", wtype=b"request", http=False),
                      _record(b"http://c", b"<p>C</p>")):
                buf = io.BytesIO()
                with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
                    gz.write(r)
                members += buf.getvalue()
            data = members
        else:
            data = wrap(blob)
        recs = W.parse_warc_records(data)
        assert [r["target_uri"] for r in recs] == ["http://a", "http://b", "http://c"]
        assert [r["warc_type"] for r in recs] == ["response", "request", "response"]
        assert recs[0]["http_status"] == 404 and recs[1]["http_status"] is None
        assert recs[0]["body"] == b"<p>A</p>"        # envelope stripped
        assert recs[1]["body"] == b"ignored"          # non-response: raw
        assert recs[0]["content_length"] == len(b"<p>A</p>")


def test_parse_warc_truncated_tail_is_dropped():
    blob = _record(b"http://a", b"<p>A</p>") + _record(b"http://b", b"<p>B</p>")
    recs = W.parse_warc_records(blob[:-20])  # cut into the last record
    assert [r["target_uri"] for r in recs] == ["http://a"]


def test_html_to_text_semantics():
    html = (
        '<html><head><title>T</title><style>p{x}</style></head>'
        "<body><p>Hello&nbsp;&amp; <b>world</b></p>"
        "<script>var x = '<p>no</p>';</script>"
        "<noscript>skip</noscript><div>  spaced\n\tout </div></body></html>"
    )
    # &nbsp; unescapes to \xa0, which str.split() treats as whitespace —
    # the collapse normalizes it to a plain space
    assert W.html_to_text(html) == "T Hello & world spaced out"
    assert W.html_to_text("") == ""
    assert W.html_to_text("plain text") == "plain text"


def test_read_warc_file_level(spark, tmp_path):
    """binaryFile reader: one .warc.gz file, three records, parsed and
    extracted end-to-end through the Spark source."""
    members = b""
    for i in range(3):
        rec = _record(
            f"http://site/{i}".encode(), f"<p>doc {i}</p>".encode()
        )
        buf = io.BytesIO()
        with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
            gz.write(rec)
        members += buf.getvalue()
    p = tmp_path / "crawl-0.warc.gz"
    p.write_bytes(members)
    out = W.extract_html_text(W.read_warc(spark, str(p))).collect()
    assert sorted(r["target_uri"] for r in out) == [
        "http://site/0", "http://site/1", "http://site/2"
    ]
    assert sorted(r["text"] for r in out) == ["doc 0", "doc 1", "doc 2"]
    assert all(r["http_status"] == 404 for r in out)
    assert all(r["source"].endswith("crawl-0.warc.gz") for r in out)


def test_warc_records_requires_carry_column(spark):
    """A payload-only input has no id column to carry through as
    ``source`` — fail loudly with the expected shape, not a bare
    StopIteration from the column scan."""
    import pytest

    df = spark.createDataFrame([(b"x",)], "payload binary")
    with pytest.raises(ValueError, match="non-payload column"):
        W.warc_records(df)
