"""Markdown extraction pins: form round-trips, the individual
CommonMark-subset semantics (heading styles, fence styles, indented
code, link flavors, emphasis stripping incl. nesting, list/quote
prefixes), and the forgiving-input convention."""

from __future__ import annotations

import hashlib

from core_spark.functions.markdown import (
    _expected_md,
    build_md_fixture,
    md_to_text,
)


def test_all_forms_round_trip():
    seen = set()
    for i in range(160):
        t = " ".join(f"w{i}x{k}" for k in range(1 + i % 45))
        h = hashlib.md5(t.encode()).hexdigest()
        seen.add(int(h[-2], 16) % 4)
        got = md_to_text(build_md_fixture(t, h))
        want = _expected_md(t, h)
        assert got["text"] == want["text"]
        assert got["title"] == want["title"]
        assert got["n_code_blocks"] == want["n_code_blocks"]
        assert got["n_links"] == want["n_links"]
    assert seen == {0, 1, 2, 3}


def test_heading_styles():
    m = md_to_text("# H1\n\nSetext H1\n====\n\nSetext H2\n----\n")
    assert m["headings"] == [(1, "H1"), (1, "Setext H1"), (2, "Setext H2")]
    m = md_to_text("### deep ###\n")
    assert m["headings"] == [(3, "deep")]


def test_code_blocks_vanish_and_count():
    m = md_to_text(
        "para one\n\n```py\nsecret = 1\n```\n\npara two\n\n"
        "    indented code\n    more code\n\npara three\n"
    )
    assert m["text"] == "para one\npara two\npara three"
    assert m["n_code_blocks"] == 2
    assert "secret" not in m["text"]


def test_link_flavors():
    m = md_to_text(
        "[inline](https://example.com/a) and [ref][r1] and "
        "<https://example.com/c>\n\n[r1]: https://example.com/b\n"
    )
    assert m["text"] == (
        "inline and ref and https://example.com/c"
    )
    assert m["n_links"] == 3


def test_unresolved_reference_stays_literal():
    m = md_to_text("[text][nope]\n")
    assert m["text"] == "[text][nope]" and m["n_links"] == 0


def test_image_reduces_to_alt():
    m = md_to_text("![alt text](https://example.com/i.png) rest\n")
    assert m["text"] == "alt text rest"


def test_emphasis_stripping_nested():
    m = md_to_text("**bold _and italic_** plus `code span`\n")
    assert m["text"] == "bold and italic plus code span"


def test_list_and_quote_prefixes():
    m = md_to_text("- item one\n- item two\n\n> quoted line\n")
    assert m["text"] == "item one item two\nquoted line"


def test_forgiving_never_raises():
    for raw in ("", "```unterminated fence\ncode", "# ", "***", ">"):
        md_to_text(raw)  # must not raise


# ------------------------------------------------------ front matter


def test_front_matter_parsed_and_excluded():
    m = md_to_text(
        "---\n"
        "title: My Post\n"
        'author: "A. Writer"\n'
        "tags: [ml, data]\n"
        "categories:\n- blog\n- tech\n"
        "date: 2024-01-02\n"
        "---\n"
        "# Heading\n\nbody text\n"
    )
    assert m["front_matter"] == {
        "title": "My Post",
        "author": "A. Writer",
        "tags": ["ml", "data"],
        "categories": ["blog", "tech"],
        "date": "2024-01-02",
    }
    assert m["text"] == "Heading\nbody text"
    assert "My Post" not in m["text"]


def test_front_matter_only_at_line_one():
    m = md_to_text("intro\n\n---\nkey: value\n---\nafter\n")
    assert m["front_matter"] == {}
    assert "key: value" in m["text"]


def test_unterminated_front_matter_is_prose():
    m = md_to_text("---\ntitle: lonely\nno closer here\n")
    assert m["front_matter"] == {}
    assert "title: lonely" in m["text"]


def test_fixture_round_trip_unaffected_by_front_matter_support():
    import hashlib

    t = "alpha bravo charlie delta echo foxtrot golf hotel india"
    h = hashlib.md5(t.encode()).hexdigest()
    got = md_to_text(build_md_fixture(t, h))
    want = _expected_md(t, h)
    assert got["text"] == want["text"]
    assert got["front_matter"] == {}
