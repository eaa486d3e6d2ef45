"""Hypothesis property-fuzz over the whole r13 container tier —
the PDF-builder-fuzz convention (tests/test_multimodal.py) applied
to every new builder: for ANY corpus-shaped document (ASCII words,
single-space separated, any length) and EVERY md5-derived form, the
builder→extractor pair must reproduce the oracle arithmetic
exactly. This is the form-independence invariant each driver oracle
assumes, checked over the space instead of at examples."""

from __future__ import annotations

import hashlib

from hypothesis import given, settings
from hypothesis import strategies as st

# corpus-shaped text: 1-60 ASCII words, no spaces inside words
_WORD = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz0123456789",
    min_size=1,
    max_size=12,
)
_TEXT = st.lists(_WORD, min_size=1, max_size=60).map(" ".join)

# force every form: hypothesis picks the nibble, we synthesize the
# digest prefix accordingly and keep the rest real
_FORM = st.integers(min_value=0, max_value=3)


def _digest(text: str, pos: int, form: int) -> str:
    h = hashlib.md5(text.encode()).hexdigest()
    return h[:pos] + format(form, "x") + h[pos + 1 :]


@settings(max_examples=60, deadline=None)
@given(text=_TEXT, form=_FORM)
def test_fuzz_docx(text, form):
    from core_spark.multimodal.docx import (
        _expected_blocks,
        build_docx_fixture,
        docx_blocks,
    )

    h = _digest(text, 3, form)
    assert docx_blocks(build_docx_fixture(text, h)) == (
        _expected_blocks(text, h)
    )


@settings(max_examples=60, deadline=None)
@given(text=_TEXT, form=_FORM)
def test_fuzz_xlsx(text, form):
    from core_spark.multimodal.xlsx import (
        _expected_cells,
        build_xlsx_fixture,
        xlsx_cells,
    )

    h = _digest(text, 6, form)
    key = lambda d: (  # noqa: E731
        d["sheet_idx"], d["row"], d["col"], d["kind"], d["value"],
        d["sheet_name"],
    )
    assert sorted(
        map(key, xlsx_cells(build_xlsx_fixture(text, h)))
    ) == sorted(map(key, _expected_cells(text, h)))


@settings(max_examples=60, deadline=None)
@given(text=_TEXT, form=_FORM)
def test_fuzz_odt(text, form):
    from core_spark.multimodal.odt import (
        _expected_paragraphs,
        build_odt_fixture,
        odt_paragraphs,
    )

    h = _digest(text, 12, form)
    assert odt_paragraphs(build_odt_fixture(text, h)) == (
        _expected_paragraphs(text, h)
    )


@settings(max_examples=60, deadline=None)
@given(text=_TEXT, form=_FORM)
def test_fuzz_epub(text, form):
    from core_spark.multimodal.epub import (
        build_epub_fixture,
        epub_chapters,
    )

    h = _digest(text, 9, form)
    m = epub_chapters(build_epub_fixture(text, h))
    words = text.split(" ")
    chunks = [
        " ".join(words[i : i + 21]) for i in range(0, len(words), 21)
    ]
    exp = chunks[::-1] if form == 2 else chunks
    assert [c["text"] for c in m["chapters"]] == exp
    assert m["ocf_strict"] == (form != 3)


@settings(max_examples=60, deadline=None)
@given(text=_TEXT, form=_FORM)
def test_fuzz_rtf(text, form):
    from core_spark.functions.rtf import (
        _expected_text,
        build_rtf_fixture,
        rtf_to_text,
    )

    h = _digest(text, 13, form)
    assert rtf_to_text(build_rtf_fixture(text, h)) == "".join(
        c + "\n" for c in _expected_text(text)
    )


@settings(max_examples=60, deadline=None)
@given(text=_TEXT, form=_FORM)
def test_fuzz_eml(text, form):
    from core_spark.functions.mail import build_eml_fixture, parse_eml

    h = _digest(text, 14, form)
    m = parse_eml(build_eml_fixture(text, h))
    words = text.split(" ")
    lines = [
        " ".join(words[i : i + 15]) for i in range(0, len(words), 15)
    ]
    assert m["subject"] == " ".join(words[:5])
    assert m["body_text"] == (
        " ".join(lines) if form == 3 else "\n".join(lines)
    )
    assert m["n_parts"] == (2 if form == 1 else 1)


@settings(max_examples=60, deadline=None)
@given(text=_TEXT, form=_FORM)
def test_fuzz_zip_bundle(text, form):
    from core_spark.functions.ziparchive import (
        build_zip_bundle_fixture,
        zip_extract,
        zip_members,
    )

    h = _digest(text, 2, form)
    raw = build_zip_bundle_fixture(text, h)
    ms = zip_members(raw)
    ns = 2 + int(h[0:2], 16) % 3
    hdr = 30 + 9 + (20 if form >= 2 else 0)
    dd = (24 if form >= 2 else 16) if form % 2 == 1 else 0
    words = text.split(" ")
    off = hdr
    for i in range(ns):
        txt = " ".join(
            words[(i * 8 + k) % len(words)] for k in range(8)
        ).encode()
        assert ms[i]["data_off"] == off
        assert zip_extract(raw, ms[i]) == txt
        off += len(txt) + dd + hdr
    assert zip_extract(raw, ms[ns]) == text.encode()


@settings(max_examples=60, deadline=None)
@given(text=_TEXT, form=_FORM)
def test_fuzz_feed(text, form):
    from core_spark.functions.feeds import (
        build_feed_fixture,
        parse_feed,
    )

    h = _digest(text, 10, form)
    f = parse_feed(build_feed_fixture(text, h))
    words = text.split(" ")
    assert f["kind"] == ("rss" if form in (0, 2) else "atom")
    assert len(f["entries"]) == 2 + int(h[0:2], 16) % 4
    for j, e in enumerate(f["entries"]):
        assert e["title"] == " ".join(
            words[(j * 4 + k) % len(words)] for k in range(4)
        )
        assert e["url"] == f"https://example.com/e/{h[:6]}/{j}"


@settings(max_examples=60, deadline=None)
@given(text=_TEXT, form=_FORM)
def test_fuzz_html_meta(text, form):
    from core_spark.functions.html_meta import (
        build_meta_fixture,
        extract_structured_meta,
    )

    h = _digest(text, 7, form)
    m = extract_structured_meta(build_meta_fixture(text, h))
    words = text.split(" ")
    assert m["headline"] == " ".join(words[:6])
    assert m["headline_src"] == {
        0: "og", 1: "ld", 2: "ld", 3: "micro",
    }[form]
    assert m["canonical"] == "https://example.com/p/" + h[:10]
    assert m["ld_ok"] is True
