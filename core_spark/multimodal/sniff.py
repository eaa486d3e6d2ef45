"""Content sniffing + dispatch — the Tika-style router a mixed
corpus actually needs first: crawled payloads arrive with missing or
lying Content-Types, so the pipeline's entry point is magic-byte
detection followed by dispatch into the right extractor. Everything
here composes the tier this repo already verifies one format at a
time (PDF, the ZIP/OOXML family, RTF, mail, feeds, HTML) into the
single entry point a real ingestion job calls.

Detection order (the public magic conventions):
- ``%PDF-`` → pdf;
- ``PK\\x03\\x04`` → the ZIP family, disambiguated by CONTENT, not
  extension: an OCF ``mimetype`` member names epub/odt directly;
  ``[Content_Types].xml`` plus a ``word/``/``xl/`` part means
  docx/xlsx; anything else is a plain zip;
- ``{\\rtf`` → rtf;  ``From `` at offset 0 → mbox;
- an XML prolog/root of ``rss``/``feed`` → feed;
- ``<!DOCTYPE html``/``<html`` (case-insensitive, after leading
  whitespace) → html;
- an RFC 5322 header block (``Name: value`` lines then a blank
  line, including a Date header) → eml;
- otherwise ``unknown`` — reported, never guessed.

Dispatch then runs the REAL extractor for the detected format and
reports the unit count (pages / blocks / cells / chapters /
messages / MIME parts / kept text blocks), so a wrong detection
fails loudly downstream rather than producing an empty "success".
"""

from __future__ import annotations

import re

_HTML_RE = re.compile(rb"^\s*(?:<!doctype\s+html|<html)", re.I)
_XML_PROLOG = re.compile(rb"^\s*(?:<\?xml[^>]*\?>\s*)?<\s*([a-zA-Z:]+)")
_HDR_LINE = re.compile(rb"^[A-Za-z][A-Za-z0-9-]*:")


def detect_format(raw: bytes) -> str:
    """Magic-byte detection over a payload prefix; ZIP-family types
    resolve by looking INSIDE the container."""
    if raw.startswith(b"%PDF-"):
        return "pdf"
    if raw.startswith(b"PK\x03\x04"):
        from core_spark.functions.ziparchive import (
            ZipError,
            zip_members,
            zip_read_member,
        )

        try:
            names = {m["name"] for m in zip_members(raw)}
            if "mimetype" in names:
                mt = zip_read_member(raw, "mimetype").rstrip()
                if mt == b"application/epub+zip":
                    return "epub"
                if mt == b"application/vnd.oasis.opendocument.text":
                    return "odt"
            if "[Content_Types].xml" in names:
                if any(n.startswith("word/") for n in names):
                    return "docx"
                if "xl/workbook.xml" in names:
                    return "xlsx"
            return "zip"
        except ZipError:
            return "unknown"
    if raw.startswith(b"{\\rtf"):
        return "rtf"
    if raw.lstrip()[:1] == b"{":
        # JSON object: a notebook iff it has the nbformat shape
        head = raw[:4096]
        if b'"cells"' in head or b'"worksheets"' in head or (
            b'"nbformat"' in head
        ):
            return "ipynb"
        return "unknown"
    if raw.startswith(b"From "):
        return "mbox"
    # LaTeX: first non-comment, non-blank line opens a document
    for ln in raw[:4096].split(b"\n"):
        t = ln.strip()
        if not t or t.startswith(b"%"):
            continue
        if t.startswith(b"\\documentclass") or t.startswith(
            b"\\begin{document}"
        ):
            return "latex"
        break
    if b"\\begin{document}" in raw[:4096]:
        return "latex"
    m = _XML_PROLOG.match(raw)
    if m:
        root = m.group(1).split(b":")[-1].lower()
        if root == b"rss":
            return "feed"
        if root == b"feed":
            return "feed"
    if _HTML_RE.match(raw):
        return "html"
    # RFC 5322 shape: header lines then an empty line, with a Date
    head = raw.split(b"\n\n", 1)[0]
    lines = head.split(b"\n")
    if (
        b"\n\n" in raw
        and lines
        and all(
            _HDR_LINE.match(ln) or ln[:1] in (b" ", b"\t")
            for ln in lines
        )
        and any(ln.lower().startswith(b"date:") for ln in lines)
    ):
        return "eml"
    return "unknown"


def dispatch_extract(raw: bytes, fmt: str) -> int:
    """Run the real extractor for the detected format; return its
    unit count. Unknown formats raise ValueError — the router never
    fabricates a success."""
    if fmt == "pdf":
        from core_spark.multimodal.pdf import pdf_pages_text

        return len(pdf_pages_text(raw))
    if fmt == "docx":
        from core_spark.multimodal.docx import docx_blocks

        return len(docx_blocks(raw))
    if fmt == "xlsx":
        from core_spark.multimodal.xlsx import xlsx_cells

        return len(xlsx_cells(raw))
    if fmt == "odt":
        from core_spark.multimodal.odt import odt_paragraphs

        return len(odt_paragraphs(raw))
    if fmt == "epub":
        from core_spark.multimodal.epub import epub_chapters

        return len(epub_chapters(raw)["chapters"])
    if fmt == "rtf":
        from core_spark.functions.rtf import rtf_to_text

        text = rtf_to_text(raw.decode("utf-8", errors="replace"))
        return len([p for p in text.split("\n") if p])
    if fmt == "eml":
        from core_spark.functions.mail import parse_eml

        return parse_eml(raw)["n_parts"]
    if fmt == "mbox":
        from core_spark.functions.mail import mbox_messages

        return len(mbox_messages(raw))
    if fmt == "feed":
        from core_spark.functions.feeds import parse_feed

        return len(
            parse_feed(raw.decode("utf-8", errors="replace"))[
                "entries"
            ]
        )
    if fmt == "html":
        from core_spark.functions.html import html_to_text

        return html_to_text(raw.decode("utf-8", errors="replace"))[
            "blocks_kept"
        ]
    if fmt == "ipynb":
        from core_spark.functions.notebook import ipynb_cells

        return len(ipynb_cells(raw))
    if fmt == "latex":
        from core_spark.functions.latex import latex_to_text

        text = latex_to_text(raw.decode("utf-8", errors="replace"))
        return len([p for p in text["text"].split("\n") if p])
    raise ValueError(f"no extractor for detected format {fmt!r}")


_BUILDERS = (
    "pdf", "docx", "xlsx", "odt", "epub", "rtf", "eml", "html",
)


def build_mixed_payload(text: str, digest: str) -> tuple[str, bytes]:
    """Fixture for q_cc_sniff: md5 nibble 16 (`digest[15]` % 8)
    picks which of the eight document shapes this payload takes;
    each format's own builder (with its own internal form rotation)
    produces the bytes. Returns (true_format, payload)."""
    fmt = _BUILDERS[int(digest[15], 16) % 8]
    if fmt == "pdf":
        from core_spark.multimodal.pdf import build_pdf_fixture

        return fmt, build_pdf_fixture(text, digest)
    if fmt == "docx":
        from core_spark.multimodal.docx import build_docx_fixture

        return fmt, build_docx_fixture(text, digest)
    if fmt == "xlsx":
        from core_spark.multimodal.xlsx import build_xlsx_fixture

        return fmt, build_xlsx_fixture(text, digest)
    if fmt == "odt":
        from core_spark.multimodal.odt import build_odt_fixture

        return fmt, build_odt_fixture(text, digest)
    if fmt == "epub":
        from core_spark.multimodal.epub import build_epub_fixture

        return fmt, build_epub_fixture(text, digest)
    if fmt == "rtf":
        from core_spark.functions.rtf import build_rtf_fixture

        return fmt, build_rtf_fixture(text, digest).encode()
    if fmt == "eml":
        from core_spark.functions.mail import build_eml_fixture

        return fmt, build_eml_fixture(text, digest)
    from core_spark.functions.html import build_html_fixture

    return fmt, build_html_fixture(text, digest).encode()
