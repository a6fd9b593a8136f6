"""Minimal from-scratch XLSX writer/reader (stdlib zipfile + XML only).

Closes the S5 gap (SURVEY.md §2.1): the reference's lineSegmentAnalyzer
writes a real ``.xlsx`` via exceljs (``lib/lineSegmentAnalyzer.js:760-949``
— one worksheet ``MainSheet``, creator ``lineSegmentAnalyzer``, column
widths 16/5/3 repeating). The sandbox has no exceljs/openpyxl equivalent,
so this module emits the OOXML container directly: a deterministic zip
(fixed timestamps, fixed member order) holding the minimal SpreadsheetML
parts. Strings are stored inline (``t="inlineStr"``) so no sharedStrings
table is needed; booleans and numbers use their native cell types —
matching how exceljs serializes the same grid values.

``read_xlsx_grid`` is the test-side inverse: it parses the worksheet XML
back into the ``{row: {column_key: value}}`` shape of
``stages.lse.render_cells`` so round-trips can be asserted without any
third-party reader.
"""

from __future__ import annotations

import re
import zipfile
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

_NS = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
_EPOCH = (1980, 1, 1, 0, 0, 0)  # fixed zip timestamp => byte-stable output


def col_letter(n: int) -> str:
    """1-indexed column number → A1-style letters (1→A, 27→AA)."""
    out = ""
    while n > 0:
        n, rem = divmod(n - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


def _letter_col(s: str) -> int:
    n = 0
    for ch in s:
        n = n * 26 + (ord(ch) - ord("A") + 1)
    return n


_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
    '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
    '<Override PartName="/xl/styles.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/>'
    '<Override PartName="/docProps/core.xml" ContentType="application/vnd.openxmlformats-package.core-properties+xml"/>'
    "</Types>"
)

_ROOT_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
    '<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/package/2006/relationships/metadata/core-properties" Target="docProps/core.xml"/>'
    "</Relationships>"
)

_WORKBOOK_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>'
    '<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/styles" Target="styles.xml"/>'
    "</Relationships>"
)

_STYLES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    f'<styleSheet xmlns="{_NS}">'
    '<fonts count="1"><font><sz val="11"/><name val="Calibri"/></font></fonts>'
    '<fills count="1"><fill><patternFill patternType="none"/></fill></fills>'
    '<borders count="1"><border/></borders>'
    '<cellStyleXfs count="1"><xf/></cellStyleXfs>'
    '<cellXfs count="1"><xf xfId="0"/></cellXfs>'
    "</styleSheet>"
)


def _workbook_xml(sheet_name: str) -> str:
    return (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<workbook xmlns="{_NS}" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        f'<sheets><sheet name="{escape(sheet_name)}" sheetId="1" r:id="rId1"/></sheets>'
        "</workbook>"
    )


def _core_xml(creator: str) -> str:
    return (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<cp:coreProperties '
        'xmlns:cp="http://schemas.openxmlformats.org/package/2006/metadata/core-properties" '
        'xmlns:dc="http://purl.org/dc/elements/1.1/">'
        f"<dc:creator>{escape(creator)}</dc:creator>"
        "</cp:coreProperties>"
    )


def _cell_xml(ref: str, value) -> str:
    if isinstance(value, bool):
        return f'<c r="{ref}" t="b"><v>{1 if value else 0}</v></c>'
    if isinstance(value, (int, float)):
        v = repr(value) if isinstance(value, float) else str(value)
        return f'<c r="{ref}"><v>{v}</v></c>'
    return f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">{escape(str(value))}</t></is></c>'


def _sheet_xml(grid: dict, widths: list[float] | None) -> str:
    columns = grid["columns"]
    parts = [
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>',
        f'<worksheet xmlns="{_NS}">',
    ]
    if widths:
        parts.append("<cols>")
        for i, w in enumerate(widths[: len(columns)], start=1):
            parts.append(
                f'<col min="{i}" max="{i}" width="{w}" customWidth="1"/>'
            )
        parts.append("</cols>")
    parts.append("<sheetData>")
    col_idx = {key: i + 1 for i, key in enumerate(columns)}
    for row in sorted(grid["cells"]):
        vals = grid["cells"][row]
        cells = [
            (col_idx[k], v) for k, v in vals.items() if k in col_idx
        ]
        cells.sort()
        parts.append(f'<row r="{row}">')
        for ci, v in cells:
            parts.append(_cell_xml(f"{col_letter(ci)}{row}", v))
        parts.append("</row>")
    parts.append("</sheetData></worksheet>")
    return "".join(parts)


def write_xlsx(
    path: str,
    grid: dict,
    sheet_name: str = "MainSheet",
    creator: str = "lineSegmentAnalyzer",
    widths: list[float] | None = None,
) -> str:
    """Write a ``render_cells``-shaped grid ({columns, cells}) as a valid
    .xlsx file. Deterministic: identical grids produce identical bytes."""
    members = [
        ("[Content_Types].xml", _CONTENT_TYPES),
        ("_rels/.rels", _ROOT_RELS),
        ("docProps/core.xml", _core_xml(creator)),
        ("xl/workbook.xml", _workbook_xml(sheet_name)),
        ("xl/_rels/workbook.xml.rels", _WORKBOOK_RELS),
        ("xl/styles.xml", _STYLES),
        ("xl/worksheets/sheet1.xml", _sheet_xml(grid, widths)),
    ]
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        for name, content in members:
            info = zipfile.ZipInfo(name, date_time=_EPOCH)
            info.compress_type = zipfile.ZIP_DEFLATED
            info.external_attr = 0o600 << 16
            zf.writestr(info, content.encode("utf-8"))
    return path


_CELL_REF = re.compile(r"([A-Z]+)(\d+)")


def read_xlsx_grid(path: str, columns: list[str]) -> dict:
    """Inverse of ``write_xlsx`` for tests: worksheet XML → {row: {key: v}}
    using ``columns`` to map column letters back to grid keys. Understands
    the cell types the writer emits (inline strings, booleans, numbers)."""
    with zipfile.ZipFile(path) as zf:
        root = ET.fromstring(zf.read("xl/worksheets/sheet1.xml"))
    cells: dict[int, dict[str, object]] = {}
    for c in root.iter(f"{{{_NS}}}c"):
        ref = c.get("r", "")
        m = _CELL_REF.fullmatch(ref)
        if not m:
            continue
        ci, row = _letter_col(m.group(1)), int(m.group(2))
        if ci > len(columns):
            continue
        key = columns[ci - 1]
        t = c.get("t", "n")
        if t == "inlineStr":
            tnode = c.find(f"{{{_NS}}}is/{{{_NS}}}t")
            val: object = tnode.text or "" if tnode is not None else ""
        else:
            vnode = c.find(f"{{{_NS}}}v")
            raw = vnode.text if vnode is not None and vnode.text else "0"
            if t == "b":
                val = raw == "1"
            else:
                f = float(raw)
                val = int(f) if f.is_integer() and "." not in raw else f
        cells.setdefault(row, {})[key] = val
    return {"columns": list(columns), "cells": cells}
