"""DOCX (ECMA-376 WordprocessingML) text extraction over the ZIP
walker — the most common OFFICE document shape in crawled corpora,
sitting beside PDF in any real training-data pipeline. Built on
public structure only: an OPC package is a ZIP
(``functions/ziparchive.py``) whose ``_rels/.rels`` names the main
document part; the part is XML whose ``w:body`` holds paragraphs
(``w:p``) of runs (``w:r``) of text (``w:t``), with ``w:tab``/
``w:br`` inline breaks and ``w:tbl``/``w:tr``/``w:tc`` tables whose
cells hold paragraphs again. Parsed with the stdlib
``xml.etree.ElementTree`` — matching by namespace URI + localname,
so ANY prefix binding (``w:``, a renamed prefix, or a default
namespace) extracts identically.

Extraction rules (the python-docx / Tika convention, restated from
the ECMA-376 part 1 element semantics):
- paragraph text = its runs' ``w:t`` contents in document order;
  a ``w:t`` WITHOUT ``xml:space="preserve"`` is stripped of
  leading/trailing whitespace (XML whitespace handling), with it the
  content is byte-exact;
- ``w:tab`` → ``\\t``, ``w:br``/``w:cr`` → ``\\n``,
  ``w:noBreakHyphen`` → ``-``;
- tracked-change DELETIONS (``w:delText``) and field instructions
  (``w:instrText``) are EXCLUDED; insertions (``w:ins`` wrappers)
  are walked normally — the accepted-changes reading;
- ``w:proofErr``, bookmarks, ``w:pPr``/``w:rPr`` properties are
  ignorable and contribute nothing;
- tables expand in row-major cell order, each cell yielding its
  paragraphs.

Corrupt-input discipline (the codec-suite rule): not-a-zip, a
package without a main-document relationship, a missing part, or
malformed XML raise the named DocxError — never a silent empty
extraction (the r12 encrypted-PDF lesson, applied from day one).

Reference parity: gazette/core moves opaque serializations only
(message/interfaces.go:121-124); document parsing happens in
executor-side Arrow kernels.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

from core_spark.functions.ziparchive import (
    ZipError,
    zip_members,
    zip_read_member,
)

W = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"
_XML_SPACE = "{http://www.w3.org/XML/1998/namespace}space"
_REL_NS = "{http://schemas.openxmlformats.org/package/2006/relationships}"
_OFFICE_DOC_TYPE = (
    "http://schemas.openxmlformats.org/officeDocument/2006/"
    "relationships/officeDocument"
)


class DocxError(ValueError):
    """Named parse failure: corrupt or non-DOCX input."""


def _parse_xml(data: bytes, what: str) -> ET.Element:
    try:
        return ET.fromstring(data)
    except ET.ParseError as e:
        raise DocxError(f"malformed XML in {what}: {e}")


def docx_main_part(raw: bytes) -> str:
    """Resolve the main document part name through ``_rels/.rels``
    (the OPC officeDocument relationship) instead of assuming
    ``word/document.xml`` — producers are allowed to name the part
    anything, and some do."""
    try:
        rels = zip_read_member(raw, "_rels/.rels")
    except ZipError as e:
        raise DocxError(f"not an OPC package: {e}")
    root = _parse_xml(rels, "_rels/.rels")
    for rel in root.iter(f"{_REL_NS}Relationship"):
        if rel.get("Type") == _OFFICE_DOC_TYPE:
            target = rel.get("Target", "")
            return target.lstrip("/")
    raise DocxError("no officeDocument relationship in _rels/.rels")


def _run_text(el: ET.Element) -> str:
    """Text of one inline element subtree, excluding deletions and
    field instructions, mapping tabs/breaks, honoring xml:space."""
    tag = el.tag
    if tag in (f"{W}delText", f"{W}instrText", f"{W}pPr", f"{W}rPr"):
        return ""
    if tag == f"{W}t":
        s = el.text or ""
        if el.get(_XML_SPACE) != "preserve":
            s = s.strip()
        return s
    if tag == f"{W}tab":
        return "\t"
    if tag in (f"{W}br", f"{W}cr"):
        return "\n"
    if tag == f"{W}noBreakHyphen":
        return "-"
    return "".join(_run_text(c) for c in el)


def _paragraph_text(p: ET.Element) -> str:
    return "".join(_run_text(c) for c in p)


def docx_blocks(raw: bytes) -> list[dict]:
    """Walk the package into text blocks: one dict per extracted
    paragraph — {block_idx, kind ('p' body paragraph | 'tc' table
    cell paragraph), text} — in document order, tables expanded
    row-major. This is the whole real-world extraction surface:
    split runs reassemble, deletions vanish, tabs and breaks map,
    any namespace prefix binding works."""
    part = docx_main_part(raw)
    names = {m["name"] for m in zip_members(raw)}
    if part not in names:
        raise DocxError(f"main document part {part!r} missing")
    body = None
    root = _parse_xml(zip_read_member(raw, part), part)
    for el in root:
        if el.tag == f"{W}body":
            body = el
            break
    if body is None:
        raise DocxError(f"{part} has no w:body")
    out: list[dict] = []

    def emit(el: ET.Element, kind: str) -> None:
        for child in el:
            if child.tag == f"{W}p":
                out.append(
                    {
                        "block_idx": len(out),
                        "kind": kind,
                        "text": _paragraph_text(child),
                    }
                )
            elif child.tag == f"{W}tbl":
                for tr in child:
                    if tr.tag != f"{W}tr":
                        continue
                    for tc in tr:
                        if tc.tag == f"{W}tc":
                            emit(tc, "tc")

    emit(body, "p")
    return out


# ------------------------------------------------------------ fixture

_PARA_WORDS = 13
_CELL_SPLIT = 6


def _esc(s: str) -> str:
    return (
        s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    )


def _t(s: str) -> str:
    """A w:t element, with xml:space=preserve exactly when the
    content has boundary whitespace (the Word writer's rule)."""
    if s != s.strip():
        return f'<w:t xml:space="preserve">{_esc(s)}</w:t>'
    return f"<w:t>{_esc(s)}</w:t>"


def _split_runs(chunk: str, digest: str) -> str:
    """Form 1: the chunk split mid-word across three runs with the
    ignorable noise a real Word document carries — rsid'd runs, rPr
    properties, proofErr/bookmark markers, a tracked DELETION whose
    delText must vanish, and one run wrapped in w:ins (kept)."""
    a = 1 + int(digest[4], 16) % max(len(chunk) - 1, 1)
    b = a + int(digest[5], 16) % max(len(chunk) - a, 1)
    p1, p2, p3 = chunk[:a], chunk[a:b], chunk[b:]
    parts = [
        '<w:proofErr w:type="spellStart"/>',
        f'<w:r w:rsidR="00AB12CD"><w:rPr><w:b/></w:rPr>{_t(p1)}</w:r>',
        '<w:bookmarkStart w:id="0" w:name="_GoBack"/>',
        f"<w:r>{_t(p2)}</w:r>",
        '<w:bookmarkEnd w:id="0"/>',
        '<w:del w:id="1"><w:r><w:delText xml:space="preserve">'
        "ZZZ deleted ZZZ</w:delText></w:r></w:del>",
        f"<w:ins w:id=\"2\"><w:r>{_t(p3)}</w:r></w:ins>",
        '<w:proofErr w:type="spellEnd"/>',
    ]
    return "".join(parts)


def build_docx_fixture(text: str, digest: str) -> bytes:
    """Deterministic DOCX for q_cc_docx: the document text in
    13-word paragraph chunks, the FORM rotating on md5 nibble 4
    (`digest[3]` % 4):

    - 0 simple: one run per paragraph, standard ``w:`` prefix,
      part at ``word/document.xml``;
    - 1 split runs: each paragraph split across three runs with
      rsid/rPr/proofErr/bookmark noise, a tracked deletion (MUST
      vanish) and a kept ``w:ins`` — same extracted text as form 0;
    - 2 tabs+breaks, DEFAULT-namespace XML (no prefix at all):
      each paragraph extracts as ``\\t`` + first word + ``\\n`` +
      rest — proves tab/br mapping and URI-based (not
      prefix-based) matching;
    - 3 table, NONSTANDARD part name ``word/doc-main.xml``: each
      chunk becomes a table row of two cells split 6/7 words —
      proves rels-following and row-major cell expansion.

    Every byte derives from (text, md5) so a SQL oracle recomputes
    the expected blocks exactly."""
    words = text.split(" ")
    form = int(digest[3], 16) % 4
    chunks = [
        " ".join(words[i : i + _PARA_WORDS])
        for i in range(0, len(words), _PARA_WORDS)
    ]
    wuri = W[1:-1]
    if form == 2:

        def _t0(s: str) -> str:
            # default-namespace twin of _t (no w: prefix)
            if s != s.strip():
                return f'<t xml:space="preserve">{_esc(s)}</t>'
            return f"<t>{_esc(s)}</t>"

        paras = []
        for c in chunks:
            cw = c.split(" ")
            head, rest = cw[0], " ".join(cw[1:])
            paras.append(
                "<p><r><tab/>{}</r><r><br/></r><r>{}</r></p>".format(
                    _t0(head), _t0(rest)
                )
            )
        doc = (
            f'<document xmlns="{wuri}" xmlns:xml="http://www.w3.org/'
            'XML/1998/namespace"><body>'
            + "".join(paras)
            + "<sectPr/></body></document>"
        )
        # ElementTree serializes xml: itself; raw string form here —
        # but xml:space must survive: the default-ns _t() output uses
        # the xml: prefix, which is predeclared in XML, so drop the
        # bogus xmlns:xml declaration.
        doc = doc.replace(
            ' xmlns:xml="http://www.w3.org/XML/1998/namespace"', ""
        )
        part = "word/document.xml"
    elif form == 3:
        rows = []
        for c in chunks:
            cw = c.split(" ")
            c1 = " ".join(cw[:_CELL_SPLIT])
            c2 = " ".join(cw[_CELL_SPLIT:])
            rows.append(
                "<w:tr>"
                f"<w:tc><w:tcPr/><w:p><w:r>{_t(c1)}</w:r></w:p></w:tc>"
                f"<w:tc><w:p><w:r>{_t(c2)}</w:r></w:p></w:tc>"
                "</w:tr>"
            )
        doc = (
            f'<w:document xmlns:w="{wuri}"><w:body>'
            "<w:tbl><w:tblPr/><w:tblGrid/>"
            + "".join(rows)
            + "</w:tbl><w:sectPr/></w:body></w:document>"
        )
        part = "word/doc-main.xml"
    elif form == 1:
        paras = [
            f"<w:p><w:pPr><w:jc w:val=\"both\"/></w:pPr>"
            f"{_split_runs(c, digest)}</w:p>"
            for c in chunks
        ]
        doc = (
            f'<w:document xmlns:w="{wuri}"><w:body>'
            + "".join(paras)
            + "</w:body></w:document>"
        )
        part = "word/document.xml"
    else:
        paras = [f"<w:p><w:r>{_t(c)}</w:r></w:p>" for c in chunks]
        doc = (
            f'<w:document xmlns:w="{wuri}"><w:body>'
            + "".join(paras)
            + "</w:body></w:document>"
        )
        part = "word/document.xml"
    rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/'
        'package/2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.'
        "openxmlformats.org/officeDocument/2006/relationships/"
        f'officeDocument" Target="/{part}"/></Relationships>'
    )
    ctypes = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/'
        '2006/content-types">'
        '<Default Extension="xml" ContentType="application/xml"/>'
        f'<Override PartName="/{part}" ContentType="application/vnd.'
        "openxmlformats-officedocument.wordprocessingml.document."
        'main+xml"/></Types>'
    )
    from core_spark.functions.ziparchive import M_DEFLATE, write_zip

    return write_zip(
        [
            ("[Content_Types].xml", ctypes.encode()),
            ("_rels/.rels", rels.encode()),
            (part, ('<?xml version="1.0"?>' + doc).encode()),
        ],
        method=M_DEFLATE,
    )


def _expected_blocks(text: str, digest: str) -> list[dict]:
    """Test-side twin of the builder+extractor pair (the oracle SQL
    restates this in DuckDB): what docx_blocks must return for a
    fixture built from (text, digest)."""
    words = text.split(" ")
    form = int(digest[3], 16) % 4
    chunks = [
        " ".join(words[i : i + _PARA_WORDS])
        for i in range(0, len(words), _PARA_WORDS)
    ]
    out = []
    for c in chunks:
        cw = c.split(" ")
        if form == 2:
            out.append(
                {"kind": "p", "text": "\t" + cw[0] + "\n" + " ".join(cw[1:])}
            )
        elif form == 3:
            out.append({"kind": "tc", "text": " ".join(cw[:_CELL_SPLIT])})
            out.append({"kind": "tc", "text": " ".join(cw[_CELL_SPLIT:])})
        else:
            out.append({"kind": "p", "text": c})
    for i, b in enumerate(out):
        b["block_idx"] = i
    return out


