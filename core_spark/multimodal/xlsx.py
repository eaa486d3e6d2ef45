"""XLSX (ECMA-376 SpreadsheetML) cell extraction over the ZIP
walker — the tabular sibling of DOCX in crawled corpora, and the
shape most scraped "datasets" actually arrive in. Public structure
only: an OPC package whose ``_rels/.rels`` names ``xl/workbook.xml``,
whose OWN rels part (``xl/_rels/workbook.xml.rels``) maps each
``<sheet r:id=…>`` to a worksheet part, plus the shared-string table
``xl/sharedStrings.xml`` that string cells index into. Parsed with
stdlib ElementTree, matching namespace URI + localname (prefix-blind,
like ``docx.py``).

Cell semantics (ECMA-376 part 1 §18.3.1.4): ``t="s"`` is an index
into the shared-string table (each ``<si>`` either one ``<t>`` or
rich-text ``<r><t>`` runs, concatenated); ``t="inlineStr"`` holds
``<is><t>`` directly; ``t="str"`` is a formula's cached string;
no ``t`` is numeric — and when a ``<f>`` formula element is present
the CACHED ``<v>`` is the value (extractors never evaluate
formulas). Cell references are A1-style (``r="BC12"``, base-26
letters then 1-based row); a cell missing its ``r`` attribute takes
the column after its predecessor, per the spec's sequential rule.

Corrupt-input discipline: not-a-zip, missing workbook/worksheet
relationships, a shared-string index out of range, an unknown cell
type, or malformed XML raise the named XlsxError — never a silent
empty sheet.

Reference parity: gazette/core moves opaque serializations only
(message/interfaces.go:121-124); document parsing happens in
executor-side Arrow kernels.
"""

from __future__ import annotations

import posixpath
import re
import xml.etree.ElementTree as ET

from core_spark.functions.ziparchive import (
    ZipError,
    zip_members,
    zip_read_member,
)
from core_spark.multimodal.docx import _parse_xml as _parse_xml_base

S = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_R_NS = (
    "{http://schemas.openxmlformats.org/officeDocument/2006/"
    "relationships}"
)
_REL_NS = "{http://schemas.openxmlformats.org/package/2006/relationships}"
_OFFICE_DOC_TYPE = (
    "http://schemas.openxmlformats.org/officeDocument/2006/"
    "relationships/officeDocument"
)
_WORKSHEET_TYPE = (
    "http://schemas.openxmlformats.org/officeDocument/2006/"
    "relationships/worksheet"
)
_SHARED_STRINGS_TYPE = (
    "http://schemas.openxmlformats.org/officeDocument/2006/"
    "relationships/sharedStrings"
)


class XlsxError(ValueError):
    """Named parse failure: corrupt or non-XLSX input."""


def _parse_xml(data: bytes, what: str) -> ET.Element:
    try:
        return _parse_xml_base(data, what)
    except ValueError as e:
        raise XlsxError(str(e))


def _read(raw: bytes, name: str, what: str) -> bytes:
    try:
        return zip_read_member(raw, name)
    except ZipError as e:
        raise XlsxError(f"{what}: {e}")


_CELL_REF = re.compile(r"^([A-Z]{1,3})([0-9]+)$")


def cell_ref(ref: str) -> tuple[int, int]:
    """A1-style reference → 0-based (row, col): letters are base-26
    with A=1 (so AA follows Z), digits are the 1-based row."""
    m = _CELL_REF.match(ref)
    if not m:
        raise XlsxError(f"bad cell reference {ref!r}")
    col = 0
    for ch in m.group(1):
        col = col * 26 + (ord(ch) - 64)
    return int(m.group(2)) - 1, col - 1


def _rels_map(raw: bytes, part: str) -> dict[str, tuple[str, str]]:
    """Parse an OPC rels part into {Id: (Type, resolved target)} —
    targets resolve relative to the part's base directory (or from
    the package root when they start with '/')."""
    base = posixpath.dirname(part)
    name = posixpath.join(
        posixpath.dirname(part), "_rels", posixpath.basename(part) + ".rels"
    )
    data = _read(raw, name, f"missing rels for {part}")
    out: dict[str, tuple[str, str]] = {}
    for rel in _parse_xml(data, name).iter(f"{_REL_NS}Relationship"):
        target = rel.get("Target", "")
        if target.startswith("/"):
            resolved = target[1:]
        else:
            resolved = posixpath.normpath(posixpath.join(base, target))
        out[rel.get("Id", "")] = (rel.get("Type", ""), resolved)
    return out


def _shared_strings(raw: bytes, part: str) -> list[str]:
    root = _parse_xml(_read(raw, part, "sharedStrings"), part)
    out: list[str] = []
    for si in root:
        if si.tag != f"{S}si":
            continue
        # one <t>, or rich-text <r><t> runs concatenated
        text = []
        for el in si.iter(f"{S}t"):
            text.append(el.text or "")
        out.append("".join(text))
    return out


def xlsx_cells(raw: bytes) -> list[dict]:
    """Walk the workbook into cells: one dict per cell —
    {sheet_idx, sheet_name, row, col, kind ('s' string | 'n'
    numeric | 'b' boolean), value (string form)} — sheets in
    workbook declaration order, resolved through the workbook's
    OWN rels part (never an assumed path)."""
    pkg_rels = None
    try:
        pkg_rels = _rels_map(raw, "")
    except XlsxError as e:
        raise XlsxError(f"not an OPC package: {e}")
    wb_part = None
    for _id, (typ, target) in pkg_rels.items():
        if typ == _OFFICE_DOC_TYPE:
            wb_part = target
            break
    if wb_part is None:
        raise XlsxError("no officeDocument relationship in _rels/.rels")
    names = {m["name"] for m in zip_members(raw)}
    if wb_part not in names:
        raise XlsxError(f"workbook part {wb_part!r} missing")
    wb_rels = _rels_map(raw, wb_part)
    shared: list[str] = []
    for _id, (typ, target) in wb_rels.items():
        if typ == _SHARED_STRINGS_TYPE and target in names:
            shared = _shared_strings(raw, target)
    wb = _parse_xml(_read(raw, wb_part, "workbook"), wb_part)
    sheets: list[tuple[str, str]] = []
    for sh in wb.iter(f"{S}sheet"):
        rid = sh.get(f"{_R_NS}id", "")
        if rid not in wb_rels or wb_rels[rid][0] != _WORKSHEET_TYPE:
            raise XlsxError(
                f"sheet {sh.get('name')!r} has no worksheet"
                f" relationship {rid!r}"
            )
        sheets.append((sh.get("name", ""), wb_rels[rid][1]))
    if not sheets:
        raise XlsxError("workbook declares no sheets")
    out: list[dict] = []
    for sheet_idx, (sheet_name, part) in enumerate(sheets):
        if part not in names:
            raise XlsxError(f"worksheet part {part!r} missing")
        ws = _parse_xml(_read(raw, part, part), part)
        for row_el in ws.iter(f"{S}row"):
            row_default = int(row_el.get("r", "0")) - 1
            next_col = 0
            for c in row_el:
                if c.tag != f"{S}c":
                    continue
                ref = c.get("r")
                if ref is not None:
                    r, col = cell_ref(ref)
                else:
                    r, col = row_default, next_col
                next_col = col + 1
                t = c.get("t", "n")
                v = c.find(f"{S}v")
                vtext = v.text if v is not None and v.text else ""
                if t == "s":
                    try:
                        idx = int(vtext)
                        value, kind = shared[idx], "s"
                    except (ValueError, IndexError):
                        raise XlsxError(
                            f"shared-string index {vtext!r} out of"
                            f" range at {part} {ref!r}"
                        )
                    if idx < 0:
                        raise XlsxError(
                            f"negative shared-string index at {ref!r}"
                        )
                elif t == "inlineStr":
                    is_el = c.find(f"{S}is")
                    value = (
                        ""
                        if is_el is None
                        else "".join(
                            t_el.text or ""
                            for t_el in is_el.iter(f"{S}t")
                        )
                    )
                    kind = "s"
                elif t == "str":
                    value, kind = vtext, "s"
                elif t == "b":
                    value, kind = vtext, "b"
                elif t == "n":
                    # <f> may precede <v>; the cached value rules
                    value, kind = vtext, "n"
                else:
                    raise XlsxError(
                        f"unsupported cell type {t!r} at {part}"
                        f" {ref!r}"
                    )
                out.append(
                    {
                        "sheet_idx": sheet_idx,
                        "sheet_name": sheet_name,
                        "row": r,
                        "col": col,
                        "kind": kind,
                        "value": value,
                    }
                )
    return out


# ------------------------------------------------------------ fixture

_COLS = 5


def _col_letters(col: int) -> str:
    s = ""
    col += 1
    while col:
        col, rem = divmod(col - 1, 26)
        s = chr(65 + rem) + s
    return s


def build_xlsx_fixture(text: str, digest: str) -> bytes:
    """Deterministic XLSX for q_cc_xlsx: the document's words tiled
    into 5-column rows — cell k (row k//5, col k%5) holds word k,
    STRING-kind unless k % 3 == 2, which is NUMERIC with value
    strlen(word_k) + k. The representation FORM rotates on md5
    nibble 7 (`digest[6]` % 4) while the logical cells stay
    IDENTICAL, so one oracle covers every form:

    - 0 shared strings (deduplicated — repeated words share one
      ``<si>``), default namespace;
    - 1 inline strings (``t="inlineStr"``), PREFIXED namespace
      (``x:``) — proves URI matching;
    - 2 shared strings where every entry is split into TWO
      rich-text runs, and every numeric cell carries a ``<f>``
      formula whose CACHED ``<v>`` is the value — proves run
      concatenation and the cached-value rule;
    - 3 TWO sheets (rows split evenly, first half rounded up) with
      NONSTANDARD part names — proves workbook-rels resolution and
      sheet ordering.

    Cells in forms 0 and 2 omit the ``r`` attribute on every third
    cell (the sequential-inference rule); row elements always carry
    theirs."""
    words = text.split(" ")
    form = int(digest[6], 16) % 4
    n = len(words)
    nrows = (n + _COLS - 1) // _COLS
    # logical cells: (row, col, kind, value)
    cells = []
    for k, w in enumerate(words):
        if k % 3 == 2:
            cells.append((k // _COLS, k % _COLS, "n", str(len(w) + k)))
        else:
            cells.append((k // _COLS, k % _COLS, "s", w))
    shared: list[str] = []
    shared_idx: dict[str, int] = {}
    if form in (0, 2, 3):
        for _r, _c, kind, v in cells:
            if kind == "s" and v not in shared_idx:
                shared_idx[v] = len(shared)
                shared.append(v)

    p = "x:" if form == 1 else ""
    suri = S[1:-1]
    ns_decl = (
        f'xmlns:x="{suri}"' if form == 1 else f'xmlns="{suri}"'
    )

    def cell_xml(r: int, c: int, kind: str, v: str, k: int) -> str:
        ref = f' r="{_col_letters(c)}{r + 1}"'
        if form in (0, 2) and k % 3 == 0 and c > 0:
            ref = ""  # sequential-inference path
        if kind == "n":
            if form == 2:
                return (
                    f"<{p}c{ref}><{p}f>LEN(Z9)</{p}f>"
                    f"<{p}v>{v}</{p}v></{p}c>"
                )
            return f"<{p}c{ref}><{p}v>{v}</{p}v></{p}c>"
        if form == 1:
            return (
                f'<{p}c{ref} t="inlineStr"><{p}is><{p}t>{v}</{p}t>'
                f"</{p}is></{p}c>"
            )
        return (
            f'<{p}c{ref} t="s"><{p}v>{shared_idx[v]}</{p}v></{p}c>'
        )

    def sheet_xml(rows: list[int], row_off: int) -> str:
        body = []
        for r in rows:
            row_cells = [
                cell_xml(r - row_off, c, kind, v, r * _COLS + c)
                for (rr, c, kind, v) in cells
                if rr == r
            ]
            body.append(
                f'<{p}row r="{r - row_off + 1}">'
                + "".join(row_cells)
                + f"</{p}row>"
            )
        return (
            f"<{p}worksheet {ns_decl}><{p}sheetData>"
            + "".join(body)
            + f"</{p}sheetData></{p}worksheet>"
        )

    if form == 3:
        split = (nrows + 1) // 2
        sheet_parts = [
            ("xl/worksheets/first-part.xml", list(range(0, split)), 0),
            (
                "xl/worksheets/second-part.xml",
                list(range(split, nrows)),
                split,
            ),
        ]
    else:
        sheet_parts = [
            ("xl/worksheets/sheet1.xml", list(range(nrows)), 0)
        ]

    entries: list[tuple[str, bytes]] = []
    ct_overrides = []
    wb_sheets = []
    wb_rels = []
    for i, (part, rows, off) in enumerate(sheet_parts):
        entries.append((part, sheet_xml(rows, off).encode()))
        rid = f"rId{i + 1}"
        wb_sheets.append(
            f'<{p}sheet name="S{i}" sheetId="{i + 1}" r:id="{rid}"/>'
        )
        target = part[3:].lstrip("/")  # relative to xl/
        wb_rels.append(
            f'<Relationship Id="{rid}" Type="{_WORKSHEET_TYPE}"'
            f' Target="{target}"/>'
        )
        ct_overrides.append(part)
    if shared:
        sst_items = []
        for s_val in shared:
            if form == 2 and len(s_val) > 1:
                a = s_val[: len(s_val) // 2]
                b = s_val[len(s_val) // 2 :]
                sst_items.append(
                    f"<si><r><rPr><b/></rPr><t>{a}</t></r>"
                    f"<r><t>{b}</t></r></si>"
                )
            else:
                sst_items.append(f"<si><t>{s_val}</t></si>")
        sst = (
            f'<sst xmlns="{suri}" count="{len(shared)}"'
            f' uniqueCount="{len(shared)}">'
            + "".join(sst_items)
            + "</sst>"
        )
        entries.append(("xl/sharedStrings.xml", sst.encode()))
        wb_rels.append(
            f'<Relationship Id="rIdS" Type="{_SHARED_STRINGS_TYPE}"'
            ' Target="sharedStrings.xml"/>'
        )
    wb = (
        f'<{p}workbook {ns_decl} xmlns:r="{_R_NS[1:-1]}">'
        f"<{p}sheets>" + "".join(wb_sheets) + f"</{p}sheets></{p}workbook>"
    )
    entries.append(("xl/workbook.xml", wb.encode()))
    entries.append(
        (
            "xl/_rels/workbook.xml.rels",
            (
                '<Relationships xmlns="'
                + _REL_NS[1:-1]
                + '">'
                + "".join(wb_rels)
                + "</Relationships>"
            ).encode(),
        )
    )
    entries.append(
        (
            "_rels/.rels",
            (
                '<Relationships xmlns="'
                + _REL_NS[1:-1]
                + '"><Relationship Id="rId1" Type="'
                + _OFFICE_DOC_TYPE
                + '" Target="xl/workbook.xml"/></Relationships>'
            ).encode(),
        )
    )
    entries.append(
        (
            "[Content_Types].xml",
            (
                '<Types xmlns="http://schemas.openxmlformats.org/'
                'package/2006/content-types">'
                '<Default Extension="xml" ContentType="application/'
                'xml"/><Default Extension="rels" ContentType="'
                "application/vnd.openxmlformats-package."
                'relationships+xml"/></Types>'
            ).encode(),
        )
    )
    from core_spark.functions.ziparchive import M_DEFLATE, write_zip

    return write_zip(sorted(entries), method=M_DEFLATE)


def _expected_cells(text: str, digest: str) -> list[dict]:
    """Test-side twin of builder+extractor (the oracle SQL restates
    this): logical cells are form-independent except that form 3
    splits rows across two sheets."""
    words = text.split(" ")
    form = int(digest[6], 16) % 4
    nrows = (len(words) + _COLS - 1) // _COLS
    split = (nrows + 1) // 2 if form == 3 else nrows
    out = []
    for k, w in enumerate(words):
        r, c = k // _COLS, k % _COLS
        sheet = 1 if form == 3 and r >= split else 0
        out.append(
            {
                "sheet_idx": sheet,
                "sheet_name": f"S{sheet}",
                "row": r - (split if sheet else 0),
                "col": c,
                "kind": "n" if k % 3 == 2 else "s",
                "value": str(len(w) + k) if k % 3 == 2 else w,
            }
        )
    return out
