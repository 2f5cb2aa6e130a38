"""Hypothesis fuzz for the WARC record walk (r11 VERDICT item 7):
``parse_warc_records`` fronts ALL crawl ingestion, so randomized record
sets — arbitrary binary bodies, mixed record types, per-record gzip,
header-case shuffling, inter-record padding, trailing garbage, and
truncation at EVERY byte offset class — must round-trip exactly or
degrade exactly as documented (truncated tail record dropped, never an
exception). The hand-built fixtures in test_warc.py pin the happy
paths; this suite walks the boundary lattice between them."""

from __future__ import annotations

import gzip
import io

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from modware_loader_spark.sources import warc as W

_SETTINGS = dict(
    max_examples=40, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)

# Bodies must not contain the record sentinel: the walk (correctly)
# resynchronizes on "WARC/" after a truncation, so a body embedding the
# sentinel makes the expected-parse of a TRUNCATED stream ambiguous by
# construction (the full-stream parse is length-prefixed and immune —
# covered by a dedicated case below).
_body = st.binary(min_size=0, max_size=120).filter(lambda b: b"WARC/" not in b)

_uri = st.text(
    alphabet=st.sampled_from("abcdefghijklmnopqrstuvwxyz0123456789:/._-"),
    min_size=1,
    max_size=40,
)

_rec = st.fixed_dictionaries(
    {
        "uri": _uri,
        "body": _body,
        "wtype": st.sampled_from(["response", "request", "metadata", "resource"]),
        "http": st.booleans(),
        "status": st.sampled_from([200, 301, 404, 503]),
        "shout": st.booleans(),  # header-name case
    }
)


def _render(rec: dict) -> tuple[bytes, dict]:
    """Record bytes + the expected parse of that record."""
    body = rec["body"]
    payload = body
    status = None
    if rec["wtype"] == "response" and rec["http"]:
        payload = (
            b"HTTP/1.1 "
            + str(rec["status"]).encode()
            + b" X\r\nContent-Type: text/html\r\n\r\n"
            + body
        )
        status = rec["status"]
    names = ("WARC-Type", "WARC-Target-URI", "Content-Length")
    if rec["shout"]:
        names = tuple(n.upper() for n in names)
    raw = (
        b"WARC/1.0\r\n"
        + names[0].encode() + b": " + rec["wtype"].encode() + b"\r\n"
        + names[1].encode() + b": " + rec["uri"].encode() + b"\r\n"
        + names[2].encode() + b": " + str(len(payload)).encode() + b"\r\n\r\n"
        + payload
        + b"\r\n\r\n"
    )
    expect = {
        "target_uri": rec["uri"],
        "warc_type": rec["wtype"],
        "http_status": status,
        "content_length": len(body),
        "body": body,
    }
    return raw, expect


def _gzip_member(raw: bytes) -> bytes:
    buf = io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
        gz.write(raw)
    return buf.getvalue()


@given(recs=st.lists(_rec, min_size=0, max_size=6), gz=st.booleans())
@settings(**_SETTINGS)
def test_warc_roundtrip_plain_and_gzip(recs, gz):
    """Well-formed streams parse to exactly the records written, plain
    and per-record-gzip identically."""
    rendered = [_render(r) for r in recs]
    blob = b"".join(
        _gzip_member(raw) if gz else raw for raw, _ in rendered
    )
    got = W.parse_warc_records(blob)
    assert got == [e for _, e in rendered]


@given(
    recs=st.lists(_rec, min_size=1, max_size=4),
    pad=st.binary(max_size=20).filter(
        lambda b: b"WARC/" not in b and not b.startswith(b"\x1f\x8b")
    ),
)
@settings(**_SETTINGS)
def test_warc_interrecord_padding_and_trailing_garbage(recs, pad):
    """Non-sentinel padding between records and after the last record
    is skipped by the resync scan — every real record still parses.
    (Padding before the FIRST record must not look like a gzip magic:
    the member walk is only entered for gzip streams.)"""
    rendered = [_render(r) for r in recs]
    blob = pad + pad.join(raw for raw, _ in rendered) + pad
    got = W.parse_warc_records(blob)
    assert got == [e for _, e in rendered]


@given(
    recs=st.lists(_rec, min_size=1, max_size=4),
    data=st.data(),
)
@settings(**_SETTINGS)
def test_warc_truncation_never_raises_yields_prefix(recs, data):
    """Truncation at ANY offset: no exception, and the result is exactly
    the records whose bytes fully fit — cutting into record k's header
    or body yields records 0..k-1 (bodies carry no sentinel, so the
    resync scan cannot invent a record from a tail fragment)."""
    rendered = [_render(r) for r in recs]
    blob = b"".join(raw for raw, _ in rendered)
    cut = data.draw(st.integers(min_value=0, max_value=len(blob)))
    got = W.parse_warc_records(blob[:cut])
    # how many records fit entirely inside the cut?
    fit, off = 0, 0
    for raw, _ in rendered:
        nxt = off + len(raw)
        # the record parses once header + declared payload are present
        # (the trailing CRLF CRLF separator is not required for the
        # LAST record — the walk is length-prefixed)
        if cut >= nxt - 4:
            fit += 1
            off = nxt
        else:
            break
    assert got == [e for _, e in rendered[:fit]]


@given(junk=st.binary(max_size=400))
@settings(**_SETTINGS)
def test_warc_arbitrary_bytes_never_raise(junk):
    """Pure fuzz: any byte soup returns a (possibly empty) list."""
    assert isinstance(W.parse_warc_records(junk), list)


@given(recs=st.lists(_rec, min_size=1, max_size=3))
@settings(**_SETTINGS)
def test_warc_sentinel_inside_body_is_opaque(recs):
    """A body CONTAINING the record sentinel must not split the record:
    the walk is length-prefixed, so embedded 'WARC/...' text is payload,
    not structure (the resync scan only runs across gaps)."""
    rendered = []
    for r in recs:
        r = dict(r)
        r["body"] = b"xx WARC/1.0\r\nWARC-Type: fake\r\n\r\n" + r["body"]
        rendered.append(_render(r))
    blob = b"".join(raw for raw, _ in rendered)
    got = W.parse_warc_records(blob)
    assert got == [e for _, e in rendered]


@given(
    rec=_rec,
    cut_tail=st.integers(min_value=1, max_value=30),
)
@settings(**_SETTINGS)
def test_warc_truncated_gzip_member_never_raises(rec, cut_tail):
    """A gzip member cut mid-stream (interrupted crawl write): the
    decompressor salvages what it can, the walk never raises, and any
    record it does return is a prefix-faithful parse (uri/type match
    the one real record or nothing)."""
    raw, expect = _render(rec)
    member = _gzip_member(raw)
    cut = member[: max(2, len(member) - cut_tail)]
    got = W.parse_warc_records(cut)
    assert isinstance(got, list) and len(got) <= 1
    if got:
        assert got[0]["target_uri"] == expect["target_uri"]
        assert got[0]["warc_type"] == expect["warc_type"]
