"""EPUB (OCF + OPF, the IDPF/W3C specs) chapter extraction over the
ZIP walker — the dominant e-book shape in crawled corpora, and the
third OOXML-adjacent container this tier covers (DOCX, XLSX, EPUB).
Public structure only: an OCF container is a ZIP whose FIRST member
SHOULD be ``mimetype`` (STORED, exactly ``application/epub+zip`` —
the magic-sniffing rule), whose ``META-INF/container.xml`` names the
OPF package document, whose OPF ``<manifest>`` maps ids to hrefs
(resolved relative to the OPF's directory), whose ``<spine>`` gives
the READING ORDER by idref — the manifest's declaration order is
NOT authoritative — and whose Dublin Core metadata carries
title/creator/language. Chapters are XHTML, extracted with the same
``html_to_text`` kernel the crawl tier uses.

Strictness split (the report-don't-lie convention): a mimetype
member that is MISSING or has the wrong content refuses with the
named EpubError — the file is not an EPUB; a mimetype that is
merely deflated or not first (common in the wild — many packagers
get this wrong) still READS, with ``ocf_strict=False`` reported so
a curation gate can count the violations. Missing container.xml,
rootfile, OPF, or a spine idref with no manifest item: EpubError.

Reference parity: gazette/core moves opaque serializations only
(message/interfaces.go:121-124); parsing happens in executor-side
Arrow kernels.
"""

from __future__ import annotations

import posixpath
import xml.etree.ElementTree as ET

from core_spark.functions.html import html_to_text
from core_spark.functions.ziparchive import (
    M_DEFLATE,
    M_STORED,
    ZipError,
    write_zip,
    zip_extract,
    zip_members,
)

_CONTAINER_NS = "{urn:oasis:names:tc:opendocument:xmlns:container}"
_OPF_NS = "{http://www.idpf.org/2007/opf}"
_DC_NS = "{http://purl.org/dc/elements/1.1/}"
_MIMETYPE = b"application/epub+zip"


class EpubError(ValueError):
    """Named parse failure: corrupt or non-EPUB input."""


def _parse_xml(data: bytes, what: str) -> ET.Element:
    try:
        return ET.fromstring(data)
    except ET.ParseError as e:
        raise EpubError(f"malformed XML in {what}: {e}")


def epub_chapters(raw: bytes) -> dict:
    """Walk the container into {title, creator, language,
    ocf_strict, chapters: [{chapter_idx, href, text}]} — chapters
    in SPINE order with each XHTML document reduced to text by the
    crawl tier's extractor."""
    try:
        members = zip_members(raw)
    except ZipError as e:
        raise EpubError(f"not an OCF container: {e}")
    by_name = {m["name"]: m for m in members}
    mt = by_name.get("mimetype")
    if mt is None:
        raise EpubError("no mimetype member: not an EPUB")
    if zip_extract(raw, mt).rstrip() != _MIMETYPE:
        raise EpubError("mimetype member is not application/epub+zip")
    ocf_strict = mt["member_idx"] == 0 and mt["method"] == 0
    cx = by_name.get("META-INF/container.xml")
    if cx is None:
        raise EpubError("no META-INF/container.xml")
    root = _parse_xml(zip_extract(raw, cx), "container.xml")
    opf_path = None
    for rf in root.iter(f"{_CONTAINER_NS}rootfile"):
        if rf.get("media-type") == "application/oebps-package+xml":
            opf_path = rf.get("full-path")
            break
    if not opf_path:
        raise EpubError("container.xml names no OPF rootfile")
    opf_m = by_name.get(opf_path)
    if opf_m is None:
        raise EpubError(f"OPF rootfile {opf_path!r} missing")
    opf = _parse_xml(zip_extract(raw, opf_m), opf_path)
    base = posixpath.dirname(opf_path)
    manifest: dict[str, str] = {}
    for item in opf.iter(f"{_OPF_NS}item"):
        href = item.get("href", "")
        manifest[item.get("id", "")] = (
            posixpath.normpath(posixpath.join(base, href))
            if base
            else href
        )

    def _dc(tag: str) -> str:
        el = next(opf.iter(f"{_DC_NS}{tag}"), None)
        return (el.text or "").strip() if el is not None else ""

    chapters = []
    for itemref in opf.iter(f"{_OPF_NS}itemref"):
        idref = itemref.get("idref", "")
        href = manifest.get(idref)
        if href is None:
            raise EpubError(f"spine idref {idref!r} not in manifest")
        ch_m = by_name.get(href)
        if ch_m is None:
            raise EpubError(f"spine item {href!r} missing from zip")
        xhtml = zip_extract(raw, ch_m).decode("utf-8")
        chapters.append(
            {
                "chapter_idx": len(chapters),
                "href": href,
                "text": html_to_text(xhtml)["text"],
            }
        )
    if not chapters:
        raise EpubError("empty spine")
    return {
        "title": _dc("title"),
        "creator": _dc("creator"),
        "language": _dc("language"),
        "ocf_strict": ocf_strict,
        "chapters": chapters,
    }


# ------------------------------------------------------------ fixture

_CHAPTER_WORDS = 21


def build_epub_fixture(text: str, digest: str) -> bytes:
    """Deterministic EPUB for q_bundle_epub: the document text in
    21-word chapters, the FORM rotating on md5 nibble 10
    (`digest[9]` % 4):

    - 0 canonical: OEBPS/content.opf, relative hrefs, mimetype
      stored first;
    - 1 root-level OPF (``package.opf``, bare hrefs) — href
      resolution without a base directory;
    - 2 spine REVERSED relative to manifest declaration order —
      chapter k of the reading order carries chunk n-1-k, proving
      the spine (not the manifest) orders the book;
    - 3 lax OCF: mimetype DEFLATED and not first — must still read,
      with ocf_strict=False reported.

    Metadata: dc:title 'Book <digest6>', dc:creator
    'A. <digest[8:12]>', dc:language 'en'."""
    words = text.split(" ")
    form = int(digest[9], 16) % 4
    chunks = [
        " ".join(words[i : i + _CHAPTER_WORDS])
        for i in range(0, len(words), _CHAPTER_WORDS)
    ]
    n = len(chunks)
    opf_path = "package.opf" if form == 1 else "OEBPS/content.opf"
    chdir = "" if form == 1 else "OEBPS/"

    def chap_xhtml(body: str, i: int) -> str:
        return (
            '<?xml version="1.0" encoding="utf-8"?>'
            '<html xmlns="http://www.w3.org/1999/xhtml"><head>'
            f"<title>Chapter {i}</title></head><body>"
            f"<p>{body}</p></body></html>"
        )

    items = [
        f'<item id="ch{i}" href="ch{i:04d}.xhtml"'
        ' media-type="application/xhtml+xml"/>'
        for i in range(n)
    ]
    spine_order = list(range(n))
    if form == 2:
        spine_order = spine_order[::-1]
    refs = [f'<itemref idref="ch{i}"/>' for i in spine_order]
    opf = (
        '<package xmlns="http://www.idpf.org/2007/opf" version="3.0"'
        ' unique-identifier="uid">'
        '<metadata xmlns:dc="http://purl.org/dc/elements/1.1/">'
        f'<dc:identifier id="uid">urn:md5:{digest}</dc:identifier>'
        f"<dc:title>Book {digest[:6]}</dc:title>"
        f"<dc:creator>A. {digest[8:12]}</dc:creator>"
        "<dc:language>en</dc:language></metadata>"
        "<manifest>" + "".join(items) + "</manifest>"
        "<spine>" + "".join(refs) + "</spine></package>"
    )
    container = (
        '<?xml version="1.0"?><container version="1.0" xmlns="urn:'
        'oasis:names:tc:opendocument:xmlns:container"><rootfiles>'
        f'<rootfile full-path="{opf_path}" media-type="application/'
        'oebps-package+xml"/></rootfiles></container>'
    )
    content: list[tuple[str, bytes]] = [
        ("META-INF/container.xml", container.encode()),
        (opf_path, opf.encode()),
    ] + [
        (f"{chdir}ch{i:04d}.xhtml", chap_xhtml(c, i).encode())
        for i, c in enumerate(chunks)
    ]
    if form == 3:
        entries = [content[0], ("mimetype", _MIMETYPE)] + content[1:]
        methods = [M_DEFLATE] * len(entries)
    else:
        entries = [("mimetype", _MIMETYPE)] + content
        methods = [M_STORED] + [M_DEFLATE] * len(content)
    return write_zip(entries, methods=methods)
