"""ODT (OASIS OpenDocument Text) extraction over the ZIP walker —
the LibreOffice/OpenOffice document shape that sits beside DOCX in
crawled corpora. Public structure only: an ODF package is a ZIP
whose ``mimetype`` member (stored, first — the same OCF-style
magic rule EPUB uses) is ``application/vnd.oasis.opendocument.text``
and whose ``content.xml`` holds ``office:body``/``office:text`` with
``text:p`` paragraphs and ``text:h`` headings.

Extraction rules (ODF 1.2 part 1 §6.1, the whitespace-fidelity
section most extractors get wrong): inside paragraph content,
``text:tab`` → ``\\t``, ``text:line-break`` → ``\\n``, and
``text:s text:c="N"`` expands to N spaces — ODF COMPRESSES runs of
spaces, so an extractor that ignores ``text:s`` silently shortens
every multi-space gap. ``text:span`` nests arbitrarily and is
transparent. ``office:annotation`` subtrees (margin comments) and
``text:note`` bodies (footnotes) are NOT paragraph text and are
excluded; ``text:note-citation`` marks likewise.

Corrupt-input discipline: not-a-zip, wrong/missing mimetype,
missing content.xml, malformed XML raise the named OdtError —
never a silent empty document.

Reference parity: gazette/core moves opaque serializations only
(message/interfaces.go:121-124); parsing happens in executor-side
Arrow kernels.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

from core_spark.functions.ziparchive import (
    M_DEFLATE,
    M_STORED,
    ZipError,
    write_zip,
    zip_members,
    zip_extract,
)

_OFFICE = "{urn:oasis:names:tc:opendocument:xmlns:office:1.0}"
_TEXT = "{urn:oasis:names:tc:opendocument:xmlns:text:1.0}"
_MIMETYPE = b"application/vnd.oasis.opendocument.text"


class OdtError(ValueError):
    """Named parse failure: corrupt or non-ODT input."""


_EXCLUDE = {
    f"{_OFFICE}annotation",
    f"{_TEXT}note",
    f"{_TEXT}note-citation",
    f"{_TEXT}tracked-changes",
}


def _content_text(el: ET.Element) -> str:
    """Paragraph-content text per ODF §6.1: spans transparent, tabs
    and line-breaks mapped, text:s expanded, annotation/note
    subtrees excluded."""
    parts: list[str] = []
    if el.text:
        parts.append(el.text)
    for child in el:
        tag = child.tag
        if tag in _EXCLUDE:
            pass
        elif tag == f"{_TEXT}tab":
            parts.append("\t")
        elif tag == f"{_TEXT}line-break":
            parts.append("\n")
        elif tag == f"{_TEXT}s":
            parts.append(" " * int(child.get(f"{_TEXT}c", "1")))
        else:
            parts.append(_content_text(child))
        if child.tail:
            parts.append(child.tail)
    return "".join(parts)


def odt_paragraphs(raw: bytes) -> list[dict]:
    """Walk the package into paragraphs: one dict per block —
    {para_idx, kind ('p' | 'h'), text} — in document order, with
    list items expanded in place."""
    try:
        members = zip_members(raw)
    except ZipError as e:
        raise OdtError(f"not an ODF package: {e}")
    by_name = {m["name"]: m for m in members}
    mt = by_name.get("mimetype")
    if mt is None or zip_extract(raw, mt).rstrip() != _MIMETYPE:
        raise OdtError("mimetype is not an OpenDocument text")
    cm = by_name.get("content.xml")
    if cm is None:
        raise OdtError("no content.xml")
    try:
        root = ET.fromstring(zip_extract(raw, cm))
    except ET.ParseError as e:
        raise OdtError(f"malformed XML in content.xml: {e}")
    body = root.find(f"{_OFFICE}body")
    text_el = body.find(f"{_OFFICE}text") if body is not None else None
    if text_el is None:
        raise OdtError("content.xml has no office:body/office:text")
    out: list[dict] = []

    def emit(container: ET.Element) -> None:
        for child in container:
            if child.tag == f"{_TEXT}p":
                out.append(
                    {
                        "para_idx": len(out),
                        "kind": "p",
                        "text": _content_text(child),
                    }
                )
            elif child.tag == f"{_TEXT}h":
                out.append(
                    {
                        "para_idx": len(out),
                        "kind": "h",
                        "text": _content_text(child),
                    }
                )
            elif child.tag == f"{_TEXT}list":
                for item in child:
                    if item.tag == f"{_TEXT}list-item":
                        emit(item)

    emit(text_el)
    return out


# ------------------------------------------------------------ fixture

_PARA_WORDS = 11


def build_odt_fixture(text: str, digest: str) -> bytes:
    """Deterministic ODT for q_cc_odt: the text in 11-word blocks,
    the FORM rotating on md5 nibble 13 (`digest[12]` % 4):

    - 0 simple ``text:p`` paragraphs;
    - 1 nested spans with an ``office:annotation`` (margin comment,
      MUST vanish) and a ``text:note`` footnote (body excluded)
      inside each paragraph — same extracted text as form 0;
    - 2 whitespace fidelity: each block extracts as first word +
      ``\\t`` + remaining words joined by THREE spaces (one literal
      + ``text:s text:c="2"``) — ignoring text:s shortens every gap;
    - 3 structure: every third block is a ``text:h`` heading, the
      block after it rides inside a ``text:list``/``list-item``."""
    words = text.split(" ")
    form = int(digest[12], 16) % 4
    chunks = [
        words[i : i + _PARA_WORDS]
        for i in range(0, len(words), _PARA_WORDS)
    ]
    blocks = []
    for k, cw in enumerate(chunks):
        joined = " ".join(cw)
        if form == 1:
            a = 1 + int(digest[13], 16) % max(len(joined) - 1, 1)
            blocks.append(
                f"<text:p><text:span>{joined[:a]}</text:span>"
                '<office:annotation><text:p>MARGIN NOTE — not body'
                "</text:p></office:annotation>"
                f"<text:span><text:span>{joined[a:]}</text:span>"
                "</text:span>"
                '<text:note text:note-class="footnote">'
                "<text:note-citation>1</text:note-citation>"
                "<text:note-body><text:p>footnote junk</text:p>"
                "</text:note-body></text:note></text:p>"
            )
        elif form == 2:
            rest = cw[1:]
            sep = ' <text:s text:c="2"/>'
            body = sep.join(f"<text:span>{w}</text:span>" for w in rest)
            blocks.append(
                f"<text:p>{cw[0]}<text:tab/>{body}</text:p>"
            )
        elif form == 3 and k % 3 == 0:
            blocks.append(
                f'<text:h text:outline-level="1">{joined}</text:h>'
            )
        elif form == 3 and k % 3 == 1:
            blocks.append(
                "<text:list><text:list-item>"
                f"<text:p>{joined}</text:p>"
                "</text:list-item></text:list>"
            )
        else:
            blocks.append(f"<text:p>{joined}</text:p>")
    content = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        "<office:document-content"
        ' xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0"'
        ' xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0"'
        ' office:version="1.2"><office:body><office:text>'
        + "".join(blocks)
        + "</office:text></office:body></office:document-content>"
    )
    manifest = (
        '<?xml version="1.0"?><manifest:manifest xmlns:manifest='
        '"urn:oasis:names:tc:opendocument:xmlns:manifest:1.0">'
        '<manifest:file-entry manifest:full-path="/" manifest:'
        'media-type="application/vnd.oasis.opendocument.text"/>'
        '<manifest:file-entry manifest:full-path="content.xml"'
        ' manifest:media-type="text/xml"/></manifest:manifest>'
    )
    return write_zip(
        [
            ("mimetype", _MIMETYPE),
            ("META-INF/manifest.xml", manifest.encode()),
            ("content.xml", content.encode()),
        ],
        methods=[M_STORED, M_DEFLATE, M_DEFLATE],
    )


def _expected_paragraphs(text: str, digest: str) -> list[dict]:
    """Test-side twin of builder+extractor (the oracle SQL restates
    this in DuckDB)."""
    words = text.split(" ")
    form = int(digest[12], 16) % 4
    chunks = [
        words[i : i + _PARA_WORDS]
        for i in range(0, len(words), _PARA_WORDS)
    ]
    out = []
    for k, cw in enumerate(chunks):
        if form == 2:
            txt = cw[0] + "\t" + "   ".join(cw[1:])
            kind = "p"
        else:
            txt = " ".join(cw)
            kind = "h" if form == 3 and k % 3 == 0 else "p"
        out.append({"para_idx": k, "kind": kind, "text": txt})
    return out
