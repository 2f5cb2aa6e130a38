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
    # &nbsp; unescapes to \xa0 and is PRESERVED: the collapse uses
    # ASCII \s+ (matching Spark's Java regex and DuckDB's RE2), so word
    # boundaries and round-trips agree with every SQL oracle; Python's
    # bare str.split() would have eaten it and silently diverged counts
    assert W.html_to_text(html) == "T Hello\xa0& world spaced out"
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


# --- main-content extraction (round 9) -------------------------------

NAV = '<nav><a href="/">Home</a> <a href="/a">About</a> <a href="/c">Contact</a></nav>'
FOOTER = '<footer>© 2026 example.com <a href="/t">Terms</a> <a href="/p">Privacy</a></footer>'
LONG = " ".join(f"w{i}" for i in range(12))


def test_main_content_keeps_long_plain_block_drops_nav_footer():
    html = f"<html><body>{NAV}<p>{LONG}</p>{FOOTER}</body></html>"
    got = W.main_content(html)
    assert got == {
        "n_blocks": 3,
        "n_content_blocks": 1,
        "main_text": LONG,
        "main_words": 12,
    }


def test_main_content_link_density_kills_long_linky_block():
    """A block can be long AND boilerplate: > 1/3 of its words linked
    ('related articles' lists) — the word-count rule alone would keep it."""
    linky = " ".join(f'<a href="#">w{i}</a>' for i in range(8)) + " x y z w"
    html = f"<body><p>{linky}</p><p>{LONG}</p></body>"
    got = W.main_content(html)
    assert got["n_content_blocks"] == 1 and got["main_text"] == LONG
    # exactly at the threshold: 4 linked of 12 -> 3*4 <= 12 keeps it
    edge = " ".join(f'<a href="#">w{i}</a>' for i in range(4)) + " " + " ".join(
        f"p{i}" for i in range(8)
    )
    got2 = W.main_content(f"<body><p>{edge}</p></body>")
    assert got2["n_content_blocks"] == 1 and got2["main_words"] == 12


def test_main_content_short_blocks_are_boilerplate():
    html = "<body><h1>short heading here</h1><p>nine words is not quite enough for the gate</p></body>"
    # p has 9 words -> below min_words=10
    got = W.main_content(html)
    assert got == {
        "n_blocks": 2,
        "n_content_blocks": 0,
        "main_text": "",
        "main_words": 0,
    }
    assert W.main_content(html, min_words=9)["n_content_blocks"] == 1


def test_main_content_multiple_content_blocks_join_in_order():
    a = " ".join(f"a{i}" for i in range(10))
    b = " ".join(f"b{i}" for i in range(10))
    html = f"<body><p>{a}</p>{NAV}<p>{b}</p></body>"
    got = W.main_content(html)
    assert got["main_text"] == a + " " + b and got["n_content_blocks"] == 2


def test_html_blocks_inline_tags_do_not_flush_and_script_skipped():
    html = "<p>one <b>two</b> three<script>var x='junk junk';</script> four</p>"
    blocks = W.html_blocks(html)
    assert len(blocks) == 1
    assert blocks[0]["text"] == "one two three four"
    assert blocks[0]["n_linked_words"] == 0


def test_extract_main_content_dataframe(spark):
    df = spark.createDataFrame(
        [(1, f"<body>{NAV}<p>{LONG}</p></body>"), (2, "<body><p>hi</p></body>"), (3, None)],
        ["doc_id", "html"],
    )
    rows = {r["doc_id"]: r for r in W.extract_main_content(df).collect()}
    assert rows[1]["main_text"] == LONG and rows[1]["n_blocks"] == 2
    assert rows[2] ["main_text"] == "" and rows[2]["n_content_blocks"] == 0
    assert rows[3]["n_blocks"] == 0 and rows[3]["main_text"] == ""


def test_unclosed_anchor_does_not_poison_later_blocks():
    """HTMLParser does no auto-closing: an unclosed <a> in a nav/teaser
    block must not mark the following article's words as linked (an
    anchor cannot legally span block elements — _a_depth resets at
    every block boundary)."""
    art = " ".join(f"w{i}" for i in range(20))
    html = f'<p><a href="/x">click here</p><p>{art}</p>'
    blocks = W.html_blocks(html)
    assert blocks[1]["n_linked_words"] == 0
    got = W.main_content(html)
    assert got["main_text"] == art and got["n_content_blocks"] == 1


def test_main_content_matches_model_hypothesis():
    """Random pages assembled from blocks with known word/link structure
    vs the classifier: the parser's segmentation and densitometric
    arithmetic must agree with the naive model for any block mix."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    block = st.tuples(
        st.integers(min_value=0, max_value=14),  # plain words
        st.integers(min_value=0, max_value=14),  # linked words
        st.sampled_from(["p", "div", "li", "h2", "footer"]),
    )

    @settings(max_examples=200, deadline=None)
    @given(st.lists(block, min_size=0, max_size=6), st.integers(2, 12))
    def run(blocks, min_words):
        html_parts, expect_kept = [], []
        for i, (n_plain, n_linked, tag) in enumerate(blocks):
            words = [f"w{i}x{j}" for j in range(n_plain)]
            links = [f'<a href="#">l{i}x{j}</a>' for j in range(n_linked)]
            html_parts.append(f"<{tag}>{' '.join(words + links)}</{tag}>")
            total = n_plain + n_linked
            if total >= min_words and 3 * n_linked <= total:
                expect_kept.append(
                    " ".join(
                        [f"w{i}x{j}" for j in range(n_plain)]
                        + [f"l{i}x{j}" for j in range(n_linked)]
                    )
                )
        got = W.main_content(
            f"<html><body>{''.join(html_parts)}</body></html>", min_words
        )
        n_nonempty = sum(1 for p, l, _ in blocks if p + l > 0)
        assert got["n_blocks"] == n_nonempty
        assert got["n_content_blocks"] == len(expect_kept)
        assert got["main_text"] == " ".join(expect_kept)

    run()
