"""ODT extraction pins: form round-trips, the ODF §6.1 whitespace
rules (text:s expansion, tabs, line-breaks), annotation/footnote
exclusion, heading/list structure, and named-error hostile paths.

Independence disclosure (the xlsx convention): the ZIP container is
stdlib-pinned (tests/test_ziparchive.py); no ODF producer exists in
this environment (no odfpy/LibreOffice), so the XML layer is
self-paired with from-spec semantic pins — the fences-table
OOXML/XLSX row's reasoning extends here."""

from __future__ import annotations

import hashlib

import pytest

from core_spark.functions.ziparchive import (
    M_DEFLATE,
    M_STORED,
    write_zip,
)
from core_spark.multimodal.odt import (
    OdtError,
    _expected_paragraphs,
    build_odt_fixture,
    odt_paragraphs,
)

OFFICE = "urn:oasis:names:tc:opendocument:xmlns:office:1.0"
TEXT = "urn:oasis:names:tc:opendocument:xmlns:text:1.0"
MIME = b"application/vnd.oasis.opendocument.text"


def _pkg(body: str, mimetype: bytes = MIME) -> bytes:
    content = (
        f'<office:document-content xmlns:office="{OFFICE}"'
        f' xmlns:text="{TEXT}"><office:body><office:text>'
        + body
        + "</office:text></office:body></office:document-content>"
    )
    return write_zip(
        [("mimetype", mimetype), ("content.xml", content.encode())],
        methods=[M_STORED, M_DEFLATE],
    )


def _texts(paras):
    return [(p["kind"], p["text"]) for p in paras]


def test_all_forms_round_trip():
    seen = set()
    for i in range(140):
        t = " ".join(f"w{i}x{k}" for k in range(1 + i % 37))
        h = hashlib.md5(t.encode()).hexdigest()
        seen.add(int(h[12], 16) % 4)
        assert odt_paragraphs(
            build_odt_fixture(t, h)
        ) == _expected_paragraphs(t, h)
    assert seen == {0, 1, 2, 3}


def test_text_s_expansion_and_default_count():
    body = (
        "<text:p>a<text:s text:c=\"3\"/>b<text:s/>c</text:p>"
    )
    assert _texts(odt_paragraphs(_pkg(body))) == [
        ("p", "a   b c")
    ]


def test_tab_linebreak_and_nested_spans():
    body = (
        "<text:p><text:span>a<text:tab/><text:span>b</text:span>"
        "</text:span><text:line-break/>c</text:p>"
    )
    assert _texts(odt_paragraphs(_pkg(body))) == [("p", "a\tb\nc")]


def test_annotation_and_footnote_excluded():
    body = (
        "<text:p>keep1"
        "<office:annotation><text:p>MARGIN</text:p></office:annotation>"
        '<text:note text:note-class="footnote">'
        "<text:note-citation>1</text:note-citation>"
        "<text:note-body><text:p>FOOT</text:p></text:note-body>"
        "</text:note>keep2</text:p>"
    )
    assert _texts(odt_paragraphs(_pkg(body))) == [("p", "keep1keep2")]


def test_headings_and_list_items_in_order():
    body = (
        '<text:h text:outline-level="1">H1</text:h>'
        "<text:list><text:list-item><text:p>item</text:p>"
        "</text:list-item></text:list>"
        "<text:p>after</text:p>"
    )
    assert _texts(odt_paragraphs(_pkg(body))) == [
        ("h", "H1"),
        ("p", "item"),
        ("p", "after"),
    ]


def test_wrong_mimetype_refuses():
    with pytest.raises(OdtError, match="mimetype"):
        odt_paragraphs(_pkg("<text:p>x</text:p>", b"application/zip"))


def test_missing_content_refuses():
    raw = write_zip([("mimetype", MIME)], methods=[M_STORED])
    with pytest.raises(OdtError, match="no content.xml"):
        odt_paragraphs(raw)


def test_not_a_zip_refuses():
    with pytest.raises(OdtError, match="not an ODF package"):
        odt_paragraphs(b"garbage garbage garbage garbage")


def test_malformed_xml_refuses():
    raw = write_zip(
        [("mimetype", MIME), ("content.xml", b"<broken")],
        methods=[M_STORED, M_DEFLATE],
    )
    with pytest.raises(OdtError, match="malformed XML"):
        odt_paragraphs(raw)
