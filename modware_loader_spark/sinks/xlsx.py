"""Minimal XLSX sink — standard library only (zipfile + hand-built OOXML).

Reference parity target: ``lib/Modware/Export/Command/dictypub.pm:70-107``
writes its report through ``Spreadsheet::WriteExcel`` (one worksheet, a
header row, then data rows). The legacy BIFF ``.xls`` container is a
binary format with no stdlib writer, but its successor ``.xlsx`` is a ZIP
of XML parts — fully writable here, and what today's consumers of that
report open anyway. Cells are written as inline strings (no shared-string
table), the simplest spec-valid encoding.

Spreadsheets are bounded artifacts (the format caps at 2^20 rows), so
rows stream through ``toLocalIterator`` — constant driver memory, no
full-table collect.
"""

from __future__ import annotations

import re
import zipfile
from collections.abc import Iterable, Sequence
from xml.sax.saxutils import escape

# Characters outside the XML 1.0 Char production (tab/LF/CR are the only
# legal controls; \x00-\x08 etc. cannot be represented even as entities
# and would make the workbook unparseable by Excel/ElementTree).
_XML_INVALID = re.compile(
    "[^\x09\x0a\x0d\x20-퟿-�\U00010000-\U0010ffff]"
)


def _xml_text(v) -> str:
    """Escape a cell value for inline-string XML, dropping XML-invalid
    control characters (the OOXML spec has no representation for them)."""
    return escape(_XML_INVALID.sub("", str(v)))

_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="rels" '
    'ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.'
    'openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
    '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/'
    'vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
    "</Types>"
)

_ROOT_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
    'officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
    "</Relationships>"
)

_WORKBOOK = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
    'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
    '<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets></workbook>'
)

_WORKBOOK_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
    'officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>'
    "</Relationships>"
)


def _col_name(i: int) -> str:
    out = ""
    i += 1
    while i:
        i, rem = divmod(i - 1, 26)
        out = chr(65 + rem) + out
    return out


def _row_xml(r: int, values: Sequence) -> str:
    import math

    cells = []
    for c, v in enumerate(values):
        if v is None:
            continue
        ref = f"{_col_name(c)}{r}"
        if isinstance(v, bool):
            cells.append(f'<c r="{ref}" t="b"><v>{int(v)}</v></c>')
        elif isinstance(v, (int, float)) and (
            not isinstance(v, float) or math.isfinite(v)
        ):
            cells.append(f'<c r="{ref}"><v>{v}</v></c>')
        else:
            # NaN/±Infinity are not valid OOXML numeric cells — fall
            # through to an inline string so the workbook stays openable
            cells.append(
                f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">'
                f"{_xml_text(v)}</t></is></c>"
            )
    return f'<row r="{r}">' + "".join(cells) + "</row>"


def write_xlsx_rows(
    rows: Iterable[Sequence], path: str, header: Sequence[str] | None = None
) -> int:
    """Write an iterable of row tuples as a one-worksheet .xlsx; returns
    the number of DATA rows written (header excluded, as the reference's
    ``$row_count`` counts it separately)."""
    n = 0
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", _CONTENT_TYPES)
        zf.writestr("_rels/.rels", _ROOT_RELS)
        zf.writestr("xl/workbook.xml", _WORKBOOK)
        zf.writestr("xl/_rels/workbook.xml.rels", _WORKBOOK_RELS)
        with zf.open("xl/worksheets/sheet1.xml", "w") as sheet:
            sheet.write(
                b'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                b'<worksheet xmlns="http://schemas.openxmlformats.org/'
                b'spreadsheetml/2006/main"><sheetData>'
            )
            r = 1
            if header is not None:
                sheet.write(_row_xml(r, list(header)).encode())
                r += 1
            for row in rows:
                sheet.write(_row_xml(r, list(row)).encode())
                r += 1
                n += 1
            sheet.write(b"</sheetData></worksheet>")
    return n


def write_xlsx(df, path: str, header: Sequence[str] | None = None) -> int:
    """DataFrame → one-worksheet .xlsx, streamed via ``toLocalIterator``
    (constant driver memory; spreadsheets are bounded artifacts by
    format). ``header`` defaults to the DataFrame's column names."""
    if header is None:
        header = df.columns
    return write_xlsx_rows(
        (tuple(row) for row in df.toLocalIterator()), path, header=header
    )


def read_xlsx_rows(path: str) -> list[list]:
    """Tiny reader for round-trip tests: inline-string/number cells of
    sheet1, returned as a dense row-major list (Nones for gaps)."""
    import re
    import xml.etree.ElementTree as ET

    ns = {"m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main"}
    with zipfile.ZipFile(path) as zf:
        root = ET.fromstring(zf.read("xl/worksheets/sheet1.xml"))
    out = []
    for row in root.findall(".//m:row", ns):
        vals: dict[int, object] = {}
        for c in row.findall("m:c", ns):
            ref = c.get("r", "A1")
            col = 0
            for ch in re.match(r"[A-Z]+", ref).group():
                col = col * 26 + (ord(ch) - 64)
            col -= 1
            if c.get("t") == "inlineStr":
                t = c.find("m:is/m:t", ns)
                vals[col] = t.text if t is not None else ""
            else:
                v = c.find("m:v", ns)
                if v is None:
                    vals[col] = None
                else:
                    try:  # int first; floats (incl. '1e-05') fall through
                        vals[col] = int(v.text)
                    except ValueError:
                        vals[col] = float(v.text)
        width = max(vals) + 1 if vals else 0
        out.append([vals.get(i) for i in range(width)])
    return out
