"""XLSX extraction pins: form round-trips, the SpreadsheetML cell
semantics (shared-string dedup + rich-text runs, inline strings,
formula cached values, A1 references incl. multi-letter columns and
the sequential-inference rule, multi-sheet workbooks through the
workbook's own rels), and the corrupt-input discipline — every
hostile mutation a named XlsxError, never a silent empty sheet.

Independence disclosure (the docx convention): the ZIP container is
pinned against stdlib zipfile (tests/test_ziparchive.py); the
SpreadsheetML layer has no independent producer in this environment
(no openpyxl/xlsxwriter — verified), so builder↔extractor is
self-paired and pinned by these from-spec semantic tests, the
LZO-class reasoning recorded in COVERAGE.md's fences table."""

from __future__ import annotations

import hashlib

import pytest

from core_spark.functions.ziparchive import write_zip
from core_spark.multimodal.xlsx import (
    XlsxError,
    _expected_cells,
    build_xlsx_fixture,
    cell_ref,
    xlsx_cells,
)

S_URI = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
R_URI = (
    "http://schemas.openxmlformats.org/officeDocument/2006/"
    "relationships"
)
PKG_REL = (
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
    '2006/relationships"><Relationship Id="rId1" Type="http://schemas.'
    "openxmlformats.org/officeDocument/2006/relationships/"
    'officeDocument" Target="xl/workbook.xml"/></Relationships>'
)


def _wb(sheet_xml: str, shared: str | None = None) -> bytes:
    wb = (
        f'<workbook xmlns="{S_URI}" xmlns:r="{R_URI}"><sheets>'
        '<sheet name="S0" sheetId="1" r:id="rId1"/></sheets></workbook>'
    )
    rels = [
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats'
        '.org/officeDocument/2006/relationships/worksheet"'
        ' Target="worksheets/sheet1.xml"/>'
    ]
    entries = [
        ("_rels/.rels", PKG_REL.encode()),
        ("xl/workbook.xml", wb.encode()),
        ("xl/worksheets/sheet1.xml", sheet_xml.encode()),
    ]
    if shared is not None:
        entries.append(("xl/sharedStrings.xml", shared.encode()))
        rels.append(
            '<Relationship Id="rIdS" Type="http://schemas.'
            "openxmlformats.org/officeDocument/2006/relationships/"
            'sharedStrings" Target="sharedStrings.xml"/>'
        )
    entries.append(
        (
            "xl/_rels/workbook.xml.rels",
            (
                '<Relationships xmlns="http://schemas.openxmlformats'
                '.org/package/2006/relationships">'
                + "".join(rels)
                + "</Relationships>"
            ).encode(),
        )
    )
    return write_zip(entries)


def _vals(cells):
    return [
        (c["row"], c["col"], c["kind"], c["value"]) for c in cells
    ]


# -------------------------------------------------------- cell refs


def test_cell_ref_decoding():
    assert cell_ref("A1") == (0, 0)
    assert cell_ref("Z9") == (8, 25)
    assert cell_ref("AA10") == (9, 26)
    assert cell_ref("BC12") == (11, 2 * 26 + 3 - 1)
    with pytest.raises(XlsxError, match="bad cell reference"):
        cell_ref("1A")


# ---------------------------------------------------- form round-trip


def test_all_forms_round_trip():
    seen = set()
    for i in range(120):
        t = " ".join(f"w{i}x{k}" for k in range(1 + i % 29))
        h = hashlib.md5(t.encode()).hexdigest()
        seen.add(int(h[6], 16) % 4)
        got = sorted(
            (
                d["sheet_idx"], d["sheet_name"], d["row"],
                d["col"], d["kind"], d["value"],
            )
            for d in xlsx_cells(build_xlsx_fixture(t, h))
        )
        want = sorted(
            (
                d["sheet_idx"], d["sheet_name"], d["row"],
                d["col"], d["kind"], d["value"],
            )
            for d in _expected_cells(t, h)
        )
        assert got == want, (int(h[6], 16) % 4, t[:40])
    assert seen == {0, 1, 2, 3}


def test_container_reads_with_stdlib_zipfile():
    import io
    import zipfile

    t = "alpha bravo charlie delta echo foxtrot golf"
    h = hashlib.md5(t.encode()).hexdigest()
    with zipfile.ZipFile(io.BytesIO(build_xlsx_fixture(t, h))) as z:
        assert "xl/workbook.xml" in z.namelist()


# ------------------------------------------------- cell semantics


def test_shared_strings_rich_text_runs_concatenate():
    shared = (
        f'<sst xmlns="{S_URI}" count="2" uniqueCount="2">'
        "<si><t>plain</t></si>"
        "<si><r><rPr><b/></rPr><t>ri</t></r><r><t>ch</t></r></si></sst>"
    )
    sheet = (
        f'<worksheet xmlns="{S_URI}"><sheetData><row r="1">'
        '<c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c>'
        "</row></sheetData></worksheet>"
    )
    assert _vals(xlsx_cells(_wb(sheet, shared))) == [
        (0, 0, "s", "plain"),
        (0, 1, "s", "rich"),
    ]


def test_formula_cached_value_and_types():
    sheet = (
        f'<worksheet xmlns="{S_URI}"><sheetData><row r="2">'
        '<c r="A2"><f>1+1</f><v>2</v></c>'
        '<c r="B2" t="str"><v>cached</v></c>'
        '<c r="C2" t="b"><v>1</v></c>'
        '<c r="D2" t="inlineStr"><is><t>inl</t></is></c>'
        "</row></sheetData></worksheet>"
    )
    assert _vals(xlsx_cells(_wb(sheet))) == [
        (1, 0, "n", "2"),
        (1, 1, "s", "cached"),
        (1, 2, "b", "1"),
        (1, 3, "s", "inl"),
    ]


def test_missing_r_attribute_sequential_inference():
    sheet = (
        f'<worksheet xmlns="{S_URI}"><sheetData><row r="3">'
        '<c r="B3"><v>1</v></c><c><v>2</v></c><c><v>3</v></c>'
        "</row></sheetData></worksheet>"
    )
    assert _vals(xlsx_cells(_wb(sheet))) == [
        (2, 1, "n", "1"),
        (2, 2, "n", "2"),
        (2, 3, "n", "3"),
    ]


def test_prefixed_namespace_matches_by_uri():
    sheet = (
        f'<x:worksheet xmlns:x="{S_URI}"><x:sheetData><x:row r="1">'
        '<x:c r="A1"><x:v>7</x:v></x:c>'
        "</x:row></x:sheetData></x:worksheet>"
    )
    assert _vals(xlsx_cells(_wb(sheet))) == [(0, 0, "n", "7")]


# ------------------------------------------------------------ hostile


def test_not_a_zip_refuses():
    with pytest.raises(XlsxError, match="not an OPC package"):
        xlsx_cells(b"not a zip archive at all, sorry..........")


def test_shared_index_out_of_range_refuses():
    shared = (
        f'<sst xmlns="{S_URI}" count="1" uniqueCount="1">'
        "<si><t>only</t></si></sst>"
    )
    sheet = (
        f'<worksheet xmlns="{S_URI}"><sheetData><row r="1">'
        '<c r="A1" t="s"><v>5</v></c></row></sheetData></worksheet>'
    )
    with pytest.raises(XlsxError, match="out of range"):
        xlsx_cells(_wb(sheet, shared))


def test_unknown_cell_type_refuses():
    sheet = (
        f'<worksheet xmlns="{S_URI}"><sheetData><row r="1">'
        '<c r="A1" t="zz"><v>1</v></c></row></sheetData></worksheet>'
    )
    with pytest.raises(XlsxError, match="unsupported cell type"):
        xlsx_cells(_wb(sheet))


def test_missing_worksheet_relationship_refuses():
    wb = (
        f'<workbook xmlns="{S_URI}" xmlns:r="{R_URI}"><sheets>'
        '<sheet name="S0" sheetId="1" r:id="rIdMISSING"/></sheets>'
        "</workbook>"
    )
    raw = write_zip(
        [
            ("_rels/.rels", PKG_REL.encode()),
            ("xl/workbook.xml", wb.encode()),
            (
                "xl/_rels/workbook.xml.rels",
                (
                    '<Relationships xmlns="http://schemas.'
                    'openxmlformats.org/package/2006/relationships"/>'
                ).encode(),
            ),
        ]
    )
    with pytest.raises(XlsxError, match="no worksheet"):
        xlsx_cells(raw)


def test_no_sheets_refuses():
    wb = f'<workbook xmlns="{S_URI}"><sheets/></workbook>'
    raw = write_zip(
        [
            ("_rels/.rels", PKG_REL.encode()),
            ("xl/workbook.xml", wb.encode()),
            (
                "xl/_rels/workbook.xml.rels",
                (
                    '<Relationships xmlns="http://schemas.'
                    'openxmlformats.org/package/2006/relationships"/>'
                ).encode(),
            ),
        ]
    )
    with pytest.raises(XlsxError, match="no sheets"):
        xlsx_cells(raw)


def test_malformed_sheet_xml_refuses():
    raw = _wb("<worksheet><unclosed")
    with pytest.raises(XlsxError, match="malformed XML"):
        xlsx_cells(raw)


def test_truncated_package_refuses():
    t = "alpha bravo charlie delta echo"
    h = hashlib.md5(t.encode()).hexdigest()
    raw = build_xlsx_fixture(t, h)
    with pytest.raises((XlsxError,)):
        xlsx_cells(raw[: len(raw) // 2])
