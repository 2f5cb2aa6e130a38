"""WARC (Web ARChive, ISO 28500) ingestion + HTML text extraction.

The front door of a crawl-derived training-data pipeline: CCNet / C4 /
RefinedWeb / FineWeb all start from Common-Crawl-shaped WARC files —
length-prefixed ``WARC/1.0`` records, in practice one gzip member per
record so readers can skip without decompressing the world. This module
provides the three pieces the curation stack upstreams from:

- ``parse_warc_records``: split a bytes blob into WARC records (plain or
  per-record-gzip), parse the WARC named headers and, for ``response``
  records, the embedded HTTP status line + headers — pure Python over
  ``zlib``, shipped by value into Arrow workers.
- ``warc_records``: the Spark source — ``(source_file, record bytes)``
  rows in, one row per record out ``(target_uri, warc_type, http_status,
  content_length, body binary)`` via ``mapInPandas``; the body bytes
  never shuffle (hash/extract/filter before anything wide).
- ``html_to_text``: stdlib ``html.parser`` boilerplate-light text
  extraction — drops ``script``/``style``/``noscript``, unescapes
  entities, collapses whitespace runs — the C4-style "text from markup"
  step (real pipelines layer readability heuristics on top; the parser
  here is the honest stdlib core, not a regex strip).

Scale shape: gzip is not splittable, so the parallelism unit is the
FILE — exactly how production crawls are laid out (millions of ~1 GB
``.warc.gz`` files): ``read_warc(spark, glob)`` uses the ``binaryFile``
source (one file per task) and splits records inside the task; per-doc
payload columns (the synthesis path the driver-verified query uses)
parallelize per row like the other media synths.

Reference scope: none (the reference ingests curated flat files, not
crawls); extension scope mandated by the north-star baseline
(training-data pipeline ingestion).
"""

from __future__ import annotations

import gzip as _gzip
import html as _html
import io
import re
import zlib
from collections.abc import Iterator
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

CRLF = b"\r\n"

# ASCII-only whitespace, matching Spark's Java-regex ``\s`` and DuckDB's
# RE2 ``\s`` — Python's bare ``str.split()`` additionally treats U+00A0,
# U+000B, U+2028 etc. as separators, which would silently diverge word
# counts (and therefore the main-content threshold) from every SQL
# oracle the moment a crawl carries non-ASCII whitespace.
_ASCII_WS = re.compile(r"\s+", re.ASCII)


def _ws_split(s: str) -> list[str]:
    """Split on ASCII whitespace runs, no empty tokens."""
    return [t for t in _ASCII_WS.split(s) if t]

WARC_SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType(), True),
        T.StructField("record_no", T.IntegerType(), False),
        T.StructField("target_uri", T.StringType(), True),
        T.StructField("warc_type", T.StringType(), True),
        T.StructField("http_status", T.IntegerType(), True),
        T.StructField("content_length", T.LongType(), True),
        T.StructField("body", T.BinaryType(), True),
    ]
)


def _gunzip_members(buf: bytes) -> bytes:
    """Decompress a concatenation of gzip members (the standard WARC
    layout: one member per record); plain bytes pass through."""
    if not buf.startswith(b"\x1f\x8b"):
        return buf
    out, pos = [], 0
    while pos < len(buf):
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        out.append(d.decompress(buf[pos:]))
        consumed = len(buf) - pos - len(d.unused_data)
        if consumed <= 0:  # trailing garbage — stop rather than spin
            break
        pos += consumed
    return b"".join(out)


def _parse_headers(block: bytes) -> dict[str, str]:
    """Case-insensitive header dict from a CRLF header block (values of
    repeated names: last wins — WARC named fields appear once)."""
    out: dict[str, str] = {}
    for line in block.split(CRLF):
        if b":" in line:
            k, v = line.split(b":", 1)
            out[k.strip().decode("latin-1").lower()] = v.strip().decode(
                "latin-1", "replace"
            )
    return out


def parse_warc_records(buf: bytes) -> list[dict]:
    """All WARC records in ``buf`` (plain or gzip-membered), each as
    ``{target_uri, warc_type, http_status, content_length, body}``.

    ``body`` is the record payload with the embedded HTTP response
    envelope stripped for ``response`` records (``http_status`` parsed
    from its status line); other record types carry their raw payload
    with ``http_status`` None. Malformed trailing bytes end the walk
    instead of raising — a truncated tail record is the normal failure
    mode of an interrupted crawl write.
    """
    data = _gunzip_members(bytes(buf))
    records, pos = [], 0
    while True:
        start = data.find(b"WARC/", pos)
        if start < 0:
            break
        hdr_end = data.find(CRLF + CRLF, start)
        if hdr_end < 0:
            break
        headers = _parse_headers(data[start:hdr_end])
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            break
        body_start = hdr_end + 4
        body = data[body_start : body_start + length]
        if len(body) < length:
            break  # truncated tail record
        status = None
        if headers.get("warc-type") == "response" and body.startswith(b"HTTP/"):
            http_end = body.find(CRLF + CRLF)
            if http_end >= 0:
                status_line = body[: body.find(CRLF)].split(b" ")
                if len(status_line) >= 2 and status_line[1].isdigit():
                    status = int(status_line[1])
                body = body[http_end + 4 :]
        records.append(
            {
                "target_uri": headers.get("warc-target-uri"),
                "warc_type": headers.get("warc-type"),
                "http_status": status,
                "content_length": len(body),
                "body": body,
            }
        )
        pos = body_start + length
    return records


class _TextExtractor(HTMLParser):
    _SKIP = {"script", "style", "noscript", "template"}

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)  # entities -> text for us
        self.parts: list[str] = []
        self._skip_depth = 0

    def handle_starttag(self, tag, attrs):
        if tag in self._SKIP:
            self._skip_depth += 1

    def handle_endtag(self, tag):
        if tag in self._SKIP and self._skip_depth:
            self._skip_depth -= 1

    def handle_data(self, data):
        if not self._skip_depth and data:
            self.parts.append(data)


def html_to_text(markup: str) -> str:
    """Visible text of an HTML document: tags dropped, ``script``/
    ``style`` subtrees skipped, entities unescaped, whitespace runs
    collapsed to single spaces, trimmed. Text nodes join with a space —
    a tag boundary is a word boundary (``<title>a</title><p>b`` must not
    fuse to ``ab``); with ``convert_charrefs`` the parser flushes one
    data node per inter-tag run, so entity-split words stay whole."""
    p = _TextExtractor()
    p.feed(markup)
    p.close()
    return " ".join(_ws_split(" ".join(p.parts)))


_BLOCK_TAGS = {
    "html", "head", "body", "title", "p", "div", "section", "article",
    "main", "header", "footer", "nav", "aside", "h1", "h2", "h3", "h4",
    "h5", "h6", "ul", "ol", "li", "table", "tr", "td", "th", "blockquote",
    "pre", "form", "figure", "figcaption", "hr",
}


class _BlockExtractor(HTMLParser):
    """Segment HTML into text blocks at block-level tag boundaries,
    tracking per-block word and linked-word counts — the measurement
    pass of a jusText / Boilerpipe densitometric classifier
    (Kohlschütter et al. 2010: word count + link density separate
    content from boilerplate; stopword densities are the jusText
    refinement). Inline tags (``a``, ``b``, ``span``, …) do NOT flush;
    ``script``/``style`` subtrees are skipped like ``_TextExtractor``."""

    _SKIP = {"script", "style", "noscript", "template"}

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[dict] = []
        self._parts: list[tuple[str, bool]] = []  # (text run, inside <a>)
        self._skip_depth = 0
        self._a_depth = 0
        self._cur_tag = ""

    def _flush(self) -> None:
        # An anchor cannot legally span block elements, and HTMLParser
        # does no auto-closing: without this reset one unclosed <a>
        # ('<p><a href=/x>click here</p><p>article…</p>') would mark
        # every later block's words as linked and the density test
        # would discard the whole page's real content.
        self._a_depth = 0
        n_words = sum(len(_ws_split(t)) for t, _ in self._parts)
        if n_words:
            self.blocks.append(
                {
                    "tag": self._cur_tag,
                    "text": " ".join(
                        _ws_split(" ".join(t for t, _ in self._parts))
                    ),
                    "n_words": n_words,
                    "n_linked_words": sum(
                        len(_ws_split(t))
                        for t, linked in self._parts
                        if linked
                    ),
                }
            )
        self._parts = []

    def handle_starttag(self, tag, attrs):
        if tag in self._SKIP:
            self._skip_depth += 1
            return
        if tag in _BLOCK_TAGS:
            self._flush()
            self._cur_tag = tag
        elif tag == "a":
            self._a_depth += 1

    def handle_endtag(self, tag):
        if tag in self._SKIP:
            if self._skip_depth:
                self._skip_depth -= 1
            return
        if tag in _BLOCK_TAGS:
            self._flush()
        elif tag == "a" and self._a_depth:
            self._a_depth -= 1

    def handle_data(self, data):
        if not self._skip_depth and data:
            self._parts.append((data, self._a_depth > 0))


def html_blocks(markup: str) -> list[dict]:
    """Text blocks of an HTML document with densitometric features:
    ``[{tag, text, n_words, n_linked_words}, ...]`` in document order.
    Empty runs (whitespace-only between block tags) produce no block."""
    p = _BlockExtractor()
    p.feed(markup)
    p.close()
    p._flush()  # trailing text after the last block tag
    return p.blocks


def is_content_block(
    n_words: int, n_linked_words: int, min_words: int = 10
) -> bool:
    """Densitometric content test: enough words AND link density
    <= 1/3, compared in exact integer arithmetic (``3 * linked <=
    total`` — no float threshold to diverge across engines)."""
    return n_words >= min_words and 3 * n_linked_words <= n_words


def main_content(markup: str, min_words: int = 10) -> dict:
    """Boilerplate-removed main text of an HTML document: blocks that
    pass :func:`is_content_block` joined with single spaces, plus the
    block census — the C4/RefinedWeb "main content extraction" stage
    the plain :func:`html_to_text` skips (it keeps nav/footer/banner
    text). Pure row-local work: no shuffle at any corpus size."""
    blocks = html_blocks(markup)
    kept = [
        b
        for b in blocks
        if is_content_block(b["n_words"], b["n_linked_words"], min_words)
    ]
    return {
        "n_blocks": len(blocks),
        "n_content_blocks": len(kept),
        "main_text": " ".join(b["text"] for b in kept),
        "main_words": sum(b["n_words"] for b in kept),
    }


def extract_main_content(
    df: DataFrame, html_col: str = "html", min_words: int = 10
) -> DataFrame:
    """DataFrame form of :func:`main_content`: every non-html column is
    carried through, the html column is replaced by ``(n_blocks,
    n_content_blocks, main_text, main_words)``. One Arrow map stage —
    markup is consumed map-side and never shuffles."""
    carry = [f for f in df.schema.fields if f.name != html_col]
    if len(carry) == len(df.schema.fields):
        raise ValueError(f"extract_main_content: no column {html_col!r}")
    schema = T.StructType(
        list(carry)
        + [
            T.StructField("n_blocks", T.IntegerType(), False),
            T.StructField("n_content_blocks", T.IntegerType(), False),
            T.StructField("main_text", T.StringType(), False),
            T.StructField("main_words", T.IntegerType(), False),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = pdf[[f.name for f in carry]].copy()
            res = [
                main_content(m if m is not None else "", min_words)
                for m in pdf[html_col]
            ]
            for k in ("n_blocks", "n_content_blocks", "main_text", "main_words"):
                out[k] = [r[k] for r in res]
            yield out

    return df.mapInPandas(batches, schema=schema)


def warc_records(media: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Spark source: one row per WARC record found in each payload blob.

    Input needs ``(media_id or source id col..., payload binary)``; the
    first non-payload column is carried through as ``source`` (cast to
    string). Splitting is per-row Python over Arrow batches — the blob
    never shuffles; downstream extraction/filters run map-side.
    """
    carry = next((c for c in media.columns if c != payload_col), None)
    if carry is None:
        raise ValueError(
            f"warc_records expects an (id, {payload_col!r}) shaped input: "
            f"need at least one non-payload column to carry through as "
            f"'source', got columns {media.columns!r}"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows: dict[str, list] = {f.name: [] for f in WARC_SCHEMA.fields}
            for src, payload in zip(pdf[carry], pdf[payload_col]):
                recs = (
                    parse_warc_records(bytes(payload))
                    if payload is not None
                    else []
                )
                for i, r in enumerate(recs):
                    rows["source"].append(str(src))
                    rows["record_no"].append(i)
                    for k in (
                        "target_uri",
                        "warc_type",
                        "http_status",
                        "content_length",
                        "body",
                    ):
                        rows[k].append(r[k])
            yield pd.DataFrame(rows)

    return media.select(carry, payload_col).mapInPandas(
        batches, schema=WARC_SCHEMA
    )


def extract_html_text(records: DataFrame) -> DataFrame:
    """``warc_records`` output + a ``text`` column: utf-8 decode of the
    body run through ``html_to_text``. One Arrow map stage — the body
    bytes are consumed here and do not survive into the (narrow) output,
    so nothing binary ever shuffles."""
    schema = T.StructType(
        [f for f in WARC_SCHEMA.fields if f.name != "body"]
        + [T.StructField("text", T.StringType(), True)]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = pdf.drop(columns=["body"]).copy()
            out["text"] = [
                html_to_text(bytes(b).decode("utf-8", "replace"))
                if b is not None
                else None
                for b in pdf["body"]
            ]
            yield out

    return records.mapInPandas(batches, schema=schema)


class _LinkExtractor(HTMLParser):
    """Harvest raw ``<a href>`` values in document order."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.links: list[str] = []

    def handle_starttag(self, tag, attrs):
        if tag == "a":
            for k, v in attrs:
                if k == "href" and v is not None:
                    self.links.append(v)


def html_links(markup: str) -> list[str]:
    """All raw anchor hrefs of an HTML document, in document order
    (empty-string hrefs included — resolution decides what survives)."""
    p = _LinkExtractor()
    p.feed(markup)
    p.close()
    return p.links


_BASE_ORIGIN = re.compile(r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]+)")


def resolve_href(base_url: str, href: str) -> str | None:
    """Resolve an anchor href against its page URL for link-graph use.

    Deliberately narrower than RFC 3986 / ``urllib.parse.urljoin``:
    keeps http(s)-absolute hrefs, resolves protocol-relative (``//h/x``
    — base scheme) and root-relative (``/x`` — base origin), and drops
    everything else (``mailto:``/``javascript:``/other schemes,
    fragment-only, empty, and path-relative hrefs — the last because
    dot-segment semantics add nothing to a HOST-level graph: a
    path-relative link always stays on the page's own host, which the
    edge stage drops as a self-loop anyway). The three kept forms are
    pure string concatenations, so a SQL oracle restates resolution
    exactly.
    """
    h = href.strip()
    if not h or h.startswith("#"):
        return None
    low = h.lower()
    if low.startswith("http://") or low.startswith("https://"):
        return h
    m = _BASE_ORIGIN.match(base_url)
    if m is None:
        return None
    if h.startswith("//"):
        return m.group(1) + ":" + h
    if h.startswith("/"):
        return m.group(0) + h
    return None


LINKS_SCHEMA = T.StructType(
    [
        T.StructField("src_url", T.StringType(), False),
        T.StructField("href", T.StringType(), False),
        T.StructField("dst_url", T.StringType(), True),
    ]
)


def extract_links(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(src_url, href, dst_url) per harvested anchor — the hyperlink
    table a crawl-scale centrality prior starts from (Common Crawl's
    host-level web graph is exactly this harvest, host-reduced).

    One Arrow map stage (``html.parser`` anchor walk + ``resolve_href``),
    embarrassingly parallel, zero shuffle; the HTML column is consumed
    here and does not survive into the narrow output. ``dst_url`` is
    NULL for dropped hrefs (mailto:/javascript:/fragment-only/
    path-relative) so per-page harvest accounting stays queryable;
    edge building filters the NULLs.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            src, raw, dst = [], [], []
            for base, markup in zip(pdf[url_col], pdf[html_col]):
                if markup is None:
                    continue
                for h in html_links(markup):
                    src.append(base)
                    raw.append(h)
                    dst.append(resolve_href(base, h))
            yield pd.DataFrame({"src_url": src, "href": raw, "dst_url": dst})

    return pages.select(url_col, html_col).mapInPandas(batches, schema=LINKS_SCHEMA)


def read_warc(spark, path_glob: str) -> DataFrame:
    """File-level WARC reader: ``binaryFile`` source (one file per task —
    gzip members are not splittable, files are the crawl's parallelism
    unit) piped through ``warc_records``; ``source`` is the file path."""
    files = spark.read.format("binaryFile").load(path_glob).select(
        "path", "content"
    )
    return warc_records(
        files.withColumnRenamed("content", "payload"), payload_col="payload"
    )


def _synth_record_bytes(mid: int, text: str | None, gzip_records: bool) -> bytes:
    """One deterministic WARC/1.0 response record (WARC named fields,
    embedded HTTP/1.1 envelope, html-escaped body; gzip member with
    fixed mtime when ``gzip_records``) — shared by ``synth_warc`` and
    the fused synth→parse→extract operators below, so fusion cannot
    drift from the staged chain byte-wise."""
    body_html = (
        "<html><head><title>doc "
        + str(mid)
        + '</title><style>p{color:black}</style></head><body><p>'
        + _html.escape(text or "")
        + "</p><script>var x=1;</script></body></html>"
    ).encode("utf-8")
    http = (
        b"HTTP/1.1 200 OK" + CRLF
        + b"Content-Type: text/html" + CRLF
        + b"Content-Length: " + str(len(body_html)).encode() + CRLF
        + CRLF + body_html
    )
    uri = f"https://crawl.example.com/doc/{mid}"
    rec = (
        b"WARC/1.0" + CRLF
        + b"WARC-Type: response" + CRLF
        + ("WARC-Target-URI: " + uri).encode() + CRLF
        + b"WARC-Record-ID: <urn:uuid:" + str(mid).encode() + b">" + CRLF
        + b"Content-Type: application/http;msgtype=response" + CRLF
        + b"Content-Length: " + str(len(http)).encode() + CRLF
        + CRLF + http + CRLF + CRLF
    )
    if gzip_records:
        buf = io.BytesIO()
        # fixed mtime: byte-deterministic output
        with _gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
            gz.write(rec)
        rec = buf.getvalue()
    return rec


def synth_warc(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    gzip_records: bool = True,
) -> DataFrame:
    """Deterministic per-row WARC response record (REAL bytes: WARC/1.0
    named fields, embedded HTTP/1.1 envelope, html-escaped body, one
    gzip member per record by default) — the synthesis analog of
    ``synth_gray_ppm``/``synth_wav_tones``, so the driver-verified query
    exercises the true record walk + gzip + HTML extraction while an
    external SQL engine can restate the construction (URI arithmetic,
    escaped body length) without a WARC stack."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, payloads = [], []
            for mid, text in zip(pdf[id_col].astype("int64"), pdf[text_col]):
                mid = int(mid)
                ids.append(mid)
                payloads.append(_synth_record_bytes(mid, text, gzip_records))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    from modware_loader_spark.operators.ivf import ensure_min_partitions

    return ensure_min_partitions(df.select(id_col, text_col)).mapInPandas(
        batches,
        schema=T.StructType(
            [
                T.StructField("media_id", T.LongType(), False),
                T.StructField("payload", T.BinaryType(), True),
            ]
        ),
    )


def _fused_synth_stage(
    df: DataFrame,
    id_col: str,
    text_col: str,
    gzip_records: bool,
    schema: T.StructType,
    emit,
) -> DataFrame:
    """Shared scaffold for the fused synth→parse→extract operators: per
    input row, build the record bytes (``_synth_record_bytes`` —
    byte-identical to ``synth_warc``), walk them back through the REAL
    record parser (``parse_warc_records``: gzip member split, header
    parse, HTTP envelope strip), and let ``emit(rows, mid, record_no,
    record)`` append the operator-specific output columns."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows: dict[str, list] = {f.name: [] for f in schema.fields}
            for mid, text in zip(pdf[id_col].astype("int64"), pdf[text_col]):
                mid = int(mid)
                rec = _synth_record_bytes(mid, text, gzip_records)
                for i, r in enumerate(parse_warc_records(rec)):
                    emit(rows, mid, i, r)
            yield pd.DataFrame(rows)

    from modware_loader_spark.operators.ivf import ensure_min_partitions

    return ensure_min_partitions(df.select(id_col, text_col)).mapInPandas(
        batches, schema=schema
    )


def synth_extract_html_text(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    gzip_records: bool = True,
) -> DataFrame:
    """Fused ``synth_warc → warc_records → extract_html_text`` for the
    driver-verified synthesis path: the same three functions composed
    inside ONE Arrow stage (guide §4: each ``mapInPandas`` is a separate
    JVM↔Python crossing with an Arrow transpose+serialization on each
    side, and the staged chain additionally ships every gzip'd WARC
    payload Python→JVM→Python just to hand it to the next Python stage).
    Output schema/rows identical to the staged chain by construction
    (same functions, same order); payload bytes never cross the
    boundary. The staged operators remain the reusable building blocks —
    production crawls enter via ``read_warc`` where the payload is READ
    in the JVM and must cross once anyway."""
    schema = T.StructType(
        [f for f in WARC_SCHEMA.fields if f.name != "body"]
        + [T.StructField("text", T.StringType(), True)]
    )

    def emit(rows, mid, record_no, r):
        rows["source"].append(str(mid))
        rows["record_no"].append(record_no)
        for k in ("target_uri", "warc_type", "http_status", "content_length"):
            rows[k].append(r[k])
        body = r["body"]
        rows["text"].append(
            html_to_text(bytes(body).decode("utf-8", "replace"))
            if body is not None
            else None
        )

    return _fused_synth_stage(df, id_col, text_col, gzip_records, schema, emit)


def synth_extract_main_content(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 10,
    gzip_records: bool = True,
) -> DataFrame:
    """Fused ``synth_warc → warc_records → decode → extract_main_content``
    (see ``synth_extract_html_text`` for the boundary arithmetic): one
    Arrow stage running the record round trip plus the densitometric
    block classifier (``main_content``). Output identical to the staged
    chain by construction; the JVM ``decode(body, 'UTF-8')`` step is
    ``bytes.decode('utf-8', 'replace')`` (both substitute U+FFFD)."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), True),
            T.StructField("n_blocks", T.IntegerType(), False),
            T.StructField("n_content_blocks", T.IntegerType(), False),
            T.StructField("main_text", T.StringType(), False),
            T.StructField("main_words", T.IntegerType(), False),
        ]
    )

    def emit(rows, mid, record_no, r):
        body = r["body"]
        html = (
            bytes(body).decode("utf-8", "replace") if body is not None else ""
        )
        mc = main_content(html, min_words)
        rows["doc_id"].append(mid)
        for k in ("n_blocks", "n_content_blocks", "main_text", "main_words"):
            rows[k].append(mc[k])

    return _fused_synth_stage(df, id_col, text_col, gzip_records, schema, emit)


def synth_warc_linked(
    df: DataFrame,
    n_hosts: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Linked crawl pages as REAL gzip'd WARC/1.0 records — the fixture
    for the end-to-end crawl chain (``pipeline_crawl_e2e``): page m
    lives on ``www.h(m % n_hosts).example.org`` and its body carries
    BOTH the document text (escaped ``<p>`` paragraph — the main-content
    block) and the six-anchor link census of the
    ``plans.pipeline_queries._synth_link_pages`` scheme (absolute
    ``(7m+1) % H`` with tracking param + fragment, protocol-relative
    ``(13m+2) % H`` with uppercase WWW. and :443, the ``m % 4 == 0`` hub
    link to h0, a root-relative self link, mailto:, fragment-only, and a
    bare ``<a>``). Deterministic bytes (fixed gzip mtime) so the fixture
    files are reproducible and an external SQL engine can restate the
    whole construction arithmetically."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, payloads = [], []
            for mid, text in zip(pdf[id_col].astype("int64"), pdf[text_col]):
                m = int(mid)
                host = f"h{m % n_hosts}.example.org"
                uri = f"https://www.{host}/d/{m}"
                a1 = (
                    f"https://h{(m * 7 + 1) % n_hosts}.example.org/p/"
                    f"{m % 50}?utm_source=feed#sec1"
                )
                a2 = f"//WWW.h{(m * 13 + 2) % n_hosts}.example.org:443/x"
                hub = (
                    '<a href="https://h0.example.org/hub">hub</a>'
                    if m % 4 == 0
                    else ""
                )
                body_html = (
                    "<html><body><p>"
                    + _html.escape(text or "")
                    + f'</p><a href="{a1}">one</a><a href="{a2}">two</a>'
                    + hub
                    + '<a href="/about">self</a>'
                    '<a href="mailto:crawl@example.org">mail</a>'
                    '<a href="#top">top</a><a>bare</a></body></html>'
                ).encode("utf-8")
                http = (
                    b"HTTP/1.1 200 OK" + CRLF
                    + b"Content-Type: text/html" + CRLF
                    + b"Content-Length: " + str(len(body_html)).encode() + CRLF
                    + CRLF + body_html
                )
                rec = (
                    b"WARC/1.0" + CRLF
                    + b"WARC-Type: response" + CRLF
                    + ("WARC-Target-URI: " + uri).encode() + CRLF
                    + b"WARC-Record-ID: <urn:uuid:" + str(m).encode() + b">" + CRLF
                    + b"Content-Type: application/http;msgtype=response" + CRLF
                    + b"Content-Length: " + str(len(http)).encode() + CRLF
                    + CRLF + http + CRLF + CRLF
                )
                buf = io.BytesIO()
                with _gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
                    gz.write(rec)
                ids.append(m)
                payloads.append(buf.getvalue())
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    from modware_loader_spark.operators.ivf import ensure_min_partitions

    return ensure_min_partitions(df.select(id_col, text_col)).mapInPandas(
        batches,
        schema=T.StructType(
            [
                T.StructField("media_id", T.LongType(), False),
                T.StructField("payload", T.BinaryType(), True),
            ]
        ),
    )
