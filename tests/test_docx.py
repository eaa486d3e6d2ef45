"""DOCX extraction pins: form round-trips on corpus-shaped text,
the ECMA-376 element semantics (deletion exclusion, xml:space,
tab/br mapping, table expansion, namespace-URI matching), and the
corrupt-input discipline — every hostile mutation a named DocxError,
never a silent empty extraction."""

from __future__ import annotations

import hashlib

import pytest

from core_spark.functions.ziparchive import (
    M_DEFLATE,
    write_zip,
    zip_read_member,
)
from core_spark.multimodal.docx import (
    DocxError,
    _expected_blocks,
    build_docx_fixture,
    docx_blocks,
    docx_main_part,
)

W_URI = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
REL_XML = (
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
    '2006/relationships"><Relationship Id="rId1" Type="http://schemas.'
    "openxmlformats.org/officeDocument/2006/relationships/"
    'officeDocument" Target="word/document.xml"/></Relationships>'
)


def _pkg(doc_xml: str, part: str = "word/document.xml") -> bytes:
    rels = REL_XML.replace("word/document.xml", part)
    return write_zip(
        [("_rels/.rels", rels.encode()), (part, doc_xml.encode())],
        method=M_DEFLATE,
    )


def _texts(blocks):
    return [(b["kind"], b["text"]) for b in blocks]


# ------------------------------------------------------ form round-trip


def test_all_forms_round_trip_on_synthetic_corpus():
    seen = set()
    for i in range(120):
        t = " ".join(f"w{i}x{k}" for k in range(3 + i % 31))
        h = hashlib.md5(t.encode()).hexdigest()
        seen.add(int(h[3], 16) % 4)
        got = docx_blocks(build_docx_fixture(t, h))
        want = _expected_blocks(t, h)
        assert got == want, (int(h[3], 16) % 4, t[:40])
    assert seen == {0, 1, 2, 3}, "rotation must hit every form"


def test_forced_forms_round_trip():
    """Drive each form explicitly via digests with chosen nibble 4."""
    t = "alpha bravo charlie delta echo foxtrot golf hotel india " \
        "juliet kilo lima mike november oscar"
    for form, nib in ((0, "0"), (1, "1"), (2, "2"), (3, "3")):
        h = "abc" + nib + hashlib.md5(t.encode()).hexdigest()[4:]
        got = docx_blocks(build_docx_fixture(t, h))
        assert got == _expected_blocks(t, h)
        if form == 3:
            assert all(b["kind"] == "tc" for b in got)


# ------------------------------------------------- element semantics


def test_deleted_text_excluded_insertions_kept():
    doc = (
        f'<w:document xmlns:w="{W_URI}"><w:body><w:p>'
        "<w:r><w:t>keep1</w:t></w:r>"
        "<w:del><w:r><w:delText>GONE</w:delText></w:r></w:del>"
        "<w:ins><w:r><w:t>keep2</w:t></w:r></w:ins>"
        "</w:p></w:body></w:document>"
    )
    assert _texts(docx_blocks(_pkg(doc))) == [("p", "keep1keep2")]


def test_field_instructions_excluded():
    doc = (
        f'<w:document xmlns:w="{W_URI}"><w:body><w:p>'
        '<w:r><w:instrText xml:space="preserve"> PAGE </w:instrText>'
        "</w:r><w:r><w:t>visible</w:t></w:r>"
        "</w:p></w:body></w:document>"
    )
    assert _texts(docx_blocks(_pkg(doc))) == [("p", "visible")]


def test_xml_space_semantics():
    doc = (
        f'<w:document xmlns:w="{W_URI}"><w:body><w:p>'
        '<w:r><w:t xml:space="preserve">  kept  </w:t></w:r>'
        "<w:r><w:t>  stripped  </w:t></w:r>"
        "</w:p></w:body></w:document>"
    )
    assert _texts(docx_blocks(_pkg(doc))) == [("p", "  kept  stripped")]


def test_tab_br_cr_nobreakhyphen_mapping():
    doc = (
        f'<w:document xmlns:w="{W_URI}"><w:body><w:p><w:r>'
        "<w:t>a</w:t><w:tab/><w:t>b</w:t><w:br/><w:t>c</w:t>"
        "<w:cr/><w:t>d</w:t><w:noBreakHyphen/><w:t>e</w:t>"
        "</w:r></w:p></w:body></w:document>"
    )
    assert _texts(docx_blocks(_pkg(doc))) == [("p", "a\tb\nc\nd-e")]


def test_default_namespace_and_renamed_prefix_match_by_uri():
    for doc in (
        f'<document xmlns="{W_URI}"><body><p><r><t>hi</t></r></p>'
        "</body></document>",
        f'<zz:document xmlns:zz="{W_URI}"><zz:body><zz:p><zz:r>'
        "<zz:t>hi</zz:t></zz:r></zz:p></zz:body></zz:document>",
    ):
        assert _texts(docx_blocks(_pkg(doc))) == [("p", "hi")]


def test_nested_table_cells_expand_row_major():
    doc = (
        f'<w:document xmlns:w="{W_URI}"><w:body>'
        "<w:p><w:r><w:t>before</w:t></w:r></w:p>"
        "<w:tbl><w:tr>"
        "<w:tc><w:p><w:r><w:t>r1c1</w:t></w:r></w:p></w:tc>"
        "<w:tc><w:p><w:r><w:t>r1c2</w:t></w:r></w:p>"
        "<w:tbl><w:tr><w:tc><w:p><w:r><w:t>inner</w:t></w:r></w:p>"
        "</w:tc></w:tr></w:tbl></w:tc>"
        "</w:tr></w:tbl>"
        "<w:p><w:r><w:t>after</w:t></w:r></w:p>"
        "</w:body></w:document>"
    )
    assert _texts(docx_blocks(_pkg(doc))) == [
        ("p", "before"),
        ("tc", "r1c1"),
        ("tc", "r1c2"),
        ("tc", "inner"),
        ("p", "after"),
    ]


def test_rels_resolves_nonstandard_part_name():
    doc = (
        f'<w:document xmlns:w="{W_URI}"><w:body><w:p><w:r>'
        "<w:t>x</w:t></w:r></w:p></w:body></w:document>"
    )
    raw = _pkg(doc, part="word/doc-main.xml")
    assert docx_main_part(raw) == "word/doc-main.xml"
    assert _texts(docx_blocks(raw)) == [("p", "x")]


# ------------------------------------------------------------ hostile


def test_not_a_zip_refuses():
    with pytest.raises(DocxError, match="not an OPC package"):
        docx_blocks(b"%PDF-1.4 this is not a zip at all............")


def test_missing_rels_refuses():
    raw = write_zip([("word/document.xml", b"<a/>")])
    with pytest.raises(DocxError, match="not an OPC package"):
        docx_blocks(raw)


def test_no_officedocument_relationship_refuses():
    rels = (
        '<Relationships xmlns="http://schemas.openxmlformats.org/'
        'package/2006/relationships"/>'
    )
    raw = write_zip([("_rels/.rels", rels.encode())])
    with pytest.raises(DocxError, match="officeDocument"):
        docx_blocks(raw)


def test_missing_main_part_refuses():
    raw = write_zip([("_rels/.rels", REL_XML.encode())])
    with pytest.raises(DocxError, match="missing"):
        docx_blocks(raw)


def test_malformed_xml_refuses():
    raw = _pkg("<w:document><unclosed")
    with pytest.raises(DocxError, match="malformed XML"):
        docx_blocks(raw)


def test_no_body_refuses():
    raw = _pkg(f'<w:document xmlns:w="{W_URI}"/>')
    with pytest.raises(DocxError, match="no w:body"):
        docx_blocks(raw)


def test_truncated_package_refuses():
    t = "alpha bravo charlie delta echo"
    h = hashlib.md5(t.encode()).hexdigest()
    raw = build_docx_fixture(t, h)
    with pytest.raises(DocxError):
        docx_blocks(raw[: len(raw) // 2])


# ------------------------------------------------------ stdlib cross-pin


def test_fixture_reads_with_stdlib_zipfile():
    """The OPC container of every form opens with the independent
    stdlib reader and holds the declared parts."""
    import io
    import zipfile

    for i in range(24):
        t = " ".join(f"q{i}z{k}" for k in range(5 + i))
        h = hashlib.md5(t.encode()).hexdigest()
        raw = build_docx_fixture(t, h)
        with zipfile.ZipFile(io.BytesIO(raw)) as z:
            names = set(z.namelist())
            assert "[Content_Types].xml" in names
            assert "_rels/.rels" in names
            part = docx_main_part(raw)
            assert part in names
            assert z.read(part).startswith(b"<?xml")
