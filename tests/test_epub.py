"""EPUB extraction pins: form round-trips, the OCF strictness split
(wrong mimetype refuses; lax packaging reads with ocf_strict=False),
spine-vs-manifest authority, href resolution, and named-error
hostile paths."""

from __future__ import annotations

import hashlib

import pytest

from core_spark.functions.ziparchive import (
    M_DEFLATE,
    M_STORED,
    write_zip,
)
from core_spark.multimodal.epub import (
    EpubError,
    build_epub_fixture,
    epub_chapters,
)

CONTAINER = (
    '<container version="1.0" xmlns="urn:oasis:names:tc:'
    'opendocument:xmlns:container"><rootfiles>'
    '<rootfile full-path="book.opf" media-type="application/'
    'oebps-package+xml"/></rootfiles></container>'
)
XHTML = (
    '<html xmlns="http://www.w3.org/1999/xhtml"><head>'
    "<title>t</title></head><body><p>hello world</p></body></html>"
)


def _opf(manifest: str, spine: str) -> str:
    return (
        '<package xmlns="http://www.idpf.org/2007/opf" version="3.0">'
        '<metadata xmlns:dc="http://purl.org/dc/elements/1.1/">'
        "<dc:title>T</dc:title><dc:creator>C</dc:creator>"
        "<dc:language>en</dc:language></metadata>"
        f"<manifest>{manifest}</manifest><spine>{spine}</spine>"
        "</package>"
    )


def _pkg(entries, methods=None):
    return write_zip(
        entries,
        methods=methods or [M_STORED] + [M_DEFLATE] * (len(entries) - 1),
    )


def test_all_forms_round_trip():
    seen = set()
    for i in range(120):
        t = " ".join(f"w{i}x{k}" for k in range(1 + i % 47))
        h = hashlib.md5(t.encode()).hexdigest()
        form = int(h[9], 16) % 4
        seen.add(form)
        m = epub_chapters(build_epub_fixture(t, h))
        words = t.split(" ")
        chunks = [
            " ".join(words[j : j + 21])
            for j in range(0, len(words), 21)
        ]
        exp = chunks[::-1] if form == 2 else chunks
        assert [c["text"] for c in m["chapters"]] == exp
        assert m["ocf_strict"] == (form != 3)
        assert m["title"] == "Book " + h[:6]
    assert seen == {0, 1, 2, 3}


def test_spine_orders_not_manifest():
    """Manifest declares a,b; spine says b,a — reading order is the
    spine's."""
    raw = _pkg(
        [
            ("mimetype", b"application/epub+zip"),
            ("META-INF/container.xml", CONTAINER.encode()),
            (
                "book.opf",
                _opf(
                    '<item id="a" href="a.xhtml" media-type="application/xhtml+xml"/>'
                    '<item id="b" href="b.xhtml" media-type="application/xhtml+xml"/>',
                    '<itemref idref="b"/><itemref idref="a"/>',
                ).encode(),
            ),
            ("a.xhtml", XHTML.replace("hello world", "AAA").encode()),
            ("b.xhtml", XHTML.replace("hello world", "BBB").encode()),
        ]
    )
    m = epub_chapters(raw)
    assert [c["text"] for c in m["chapters"]] == ["BBB", "AAA"]
    assert m["ocf_strict"]


def test_missing_mimetype_refuses():
    raw = _pkg(
        [
            ("META-INF/container.xml", CONTAINER.encode()),
        ],
        methods=[M_DEFLATE],
    )
    with pytest.raises(EpubError, match="no mimetype"):
        epub_chapters(raw)


def test_wrong_mimetype_refuses():
    raw = _pkg(
        [
            ("mimetype", b"application/zip"),
            ("META-INF/container.xml", CONTAINER.encode()),
        ]
    )
    with pytest.raises(EpubError, match="not application/epub"):
        epub_chapters(raw)


def test_lax_ocf_reads_with_flag():
    raw = _pkg(
        [
            ("META-INF/container.xml", CONTAINER.encode()),
            ("mimetype", b"application/epub+zip"),
            (
                "book.opf",
                _opf(
                    '<item id="a" href="a.xhtml" media-type="application/xhtml+xml"/>',
                    '<itemref idref="a"/>',
                ).encode(),
            ),
            ("a.xhtml", XHTML.encode()),
        ],
        methods=[M_DEFLATE] * 4,
    )
    m = epub_chapters(raw)
    assert m["ocf_strict"] is False
    assert m["chapters"][0]["text"] == "hello world"


def test_spine_idref_not_in_manifest_refuses():
    raw = _pkg(
        [
            ("mimetype", b"application/epub+zip"),
            ("META-INF/container.xml", CONTAINER.encode()),
            (
                "book.opf",
                _opf(
                    '<item id="a" href="a.xhtml" media-type="application/xhtml+xml"/>',
                    '<itemref idref="nope"/>',
                ).encode(),
            ),
            ("a.xhtml", XHTML.encode()),
        ]
    )
    with pytest.raises(EpubError, match="not in manifest"):
        epub_chapters(raw)


def test_missing_rootfile_and_container_refuse():
    raw = _pkg([("mimetype", b"application/epub+zip")])
    with pytest.raises(EpubError, match="container.xml"):
        epub_chapters(raw)
    raw = _pkg(
        [
            ("mimetype", b"application/epub+zip"),
            (
                "META-INF/container.xml",
                CONTAINER.replace("book.opf", "gone.opf").encode(),
            ),
        ]
    )
    with pytest.raises(EpubError, match="missing"):
        epub_chapters(raw)


def test_not_a_zip_refuses():
    with pytest.raises(EpubError, match="not an OCF container"):
        epub_chapters(b"PK\x03\x04 but truncated garbage")


def test_href_resolution_relative_to_opf_dir():
    """The canonical form puts chapters beside OEBPS/content.opf;
    a bare href must resolve into that directory."""
    t = "alpha " * 25
    h = "0" * 10 + hashlib.md5(t.encode()).hexdigest()[10:]  # form 0
    m = epub_chapters(build_epub_fixture(t.strip(), h))
    assert m["chapters"][0]["href"].startswith("OEBPS/")
