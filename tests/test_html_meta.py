"""Structured-metadata extraction pins: the four fixture forms, the
merge precedence (JSON-LD > microdata > OpenGraph > title), the
JSON-LD shape space (@graph, list @type, nested/list authors), the
loud ld_ok=False path for broken JSON, and microdata scoping."""

from __future__ import annotations

import hashlib

from core_spark.functions.html_meta import (
    build_meta_fixture,
    extract_structured_meta,
)


def _expected(t: str, h: str):
    words = t.split(" ")
    form = int(h[7], 16) % 4
    head6 = " ".join(words[:6])
    date = (
        f"{2000 + int(h[1:3], 16) % 26:04d}-"
        f"{1 + int(h[3], 16) % 12:02d}-{1 + int(h[4], 16) % 28:02d}"
    )
    src = {0: "og", 1: "ld", 2: "ld", 3: "micro"}[form]
    return form, head6, src, date, "A. " + h[8:12]


def test_all_forms_round_trip():
    seen = set()
    for i in range(160):
        t = " ".join(f"w{i}x{k}" for k in range(6 + i % 25))
        h = hashlib.md5(t.encode()).hexdigest()
        form, head6, src, date, author = _expected(t, h)
        seen.add(form)
        m = extract_structured_meta(build_meta_fixture(t, h))
        assert m["headline"] == head6
        assert m["headline_src"] == src
        assert m["pub_date"] == date
        assert m["author"] == author
        assert m["canonical"] == "https://example.com/p/" + h[:10]
        assert m["title"] == "Doc " + h[:8]
        assert m["ld_ok"] is True
        assert m["n_og"] == (4 if form in (0, 2) else 0)
    assert seen == {0, 1, 2, 3}


def test_conflict_form_ld_beats_og():
    """Form 2 plants a DIFFERENT og:title; the @graph Article node
    must win the merge."""
    for i in range(200):
        t = " ".join(f"c{i}w{k}" for k in range(9))
        h = hashlib.md5(t.encode()).hexdigest()
        if int(h[7], 16) % 4 == 2:
            m = extract_structured_meta(build_meta_fixture(t, h))
            assert m["headline_src"] == "ld"
            assert m["headline"] == " ".join(t.split(" ")[:6])
            assert m["og"]["og:title"] == " ".join(t.split(" ")[:4])
            return
    raise AssertionError("no form-2 digest in 200 tries")


def test_broken_json_ld_reported_not_silent():
    raw = (
        '<html><head><script type="application/ld+json">{oops'
        "</script><title>T</title></head></html>"
    )
    m = extract_structured_meta(raw)
    assert m["ld_ok"] is False
    assert m["headline"] == "T" and m["headline_src"] == "title"


def test_plain_script_not_treated_as_ld():
    raw = (
        "<html><head><script>var x ="
        ' {"@type":"Article","headline":"NO"};</script></head></html>'
    )
    m = extract_structured_meta(raw)
    assert m["ld"] == {} and m["ld_ok"] is True


def test_ld_shapes_graph_list_types_author_forms():
    for body, author in (
        ('{"@type":"Article","headline":"H","author":"plain"}', "plain"),
        (
            '{"@graph":[{"@type":"WebSite"},{"@type":["Article"],'
            '"headline":"H","author":{"name":"obj"}}]}',
            "obj",
        ),
        (
            '[{"@type":"Person"},{"@type":"Article","headline":"H",'
            '"author":[{"name":"first"},{"name":"second"}]}]',
            "first",
        ),
        (
            '{"@type":"https://schema.org/Article","headline":"H"}',
            "",
        ),
    ):
        raw = (
            f'<script type="application/ld+json">{body}</script>'
        )
        m = extract_structured_meta(raw)
        assert m["headline"] == "H", body
        assert m["author"] == author, body


def test_first_article_node_wins():
    raw = (
        '<script type="application/ld+json">'
        '{"@type":"Article","headline":"first"}</script>'
        '<script type="application/ld+json">'
        '{"@type":"Article","headline":"second"}</script>'
    )
    assert extract_structured_meta(raw)["headline"] == "first"


def test_microdata_nested_scope_isolation():
    raw = (
        '<div itemscope itemtype="https://schema.org/Article">'
        '<span itemprop="headline">H</span>'
        '<div itemscope itemtype="https://schema.org/Person">'
        '<span itemprop="name">P</span></div>'
        '<meta itemprop="datePublished" content="2020-01-02"></div>'
    )
    m = extract_structured_meta(raw)
    assert m["micro"]["headline"] == "H"
    assert m["micro"]["datePublished"] == "2020-01-02"
    assert "name" not in m["micro"]


def test_microdata_unclosed_scope_still_reported():
    raw = (
        '<div itemscope itemtype="https://schema.org/Article">'
        '<span itemprop="headline">H</span>'
    )
    assert extract_structured_meta(raw)["micro"]["headline"] == "H"


def test_og_first_value_wins_and_meta_author_fallback():
    raw = (
        '<meta property="og:title" content="first">'
        '<meta property="og:title" content="second">'
        '<meta name="author" content="meta-author">'
    )
    m = extract_structured_meta(raw)
    assert m["headline"] == "first" and m["headline_src"] == "og"
    assert m["author"] == "meta-author"


def test_canonical_first_wins():
    raw = (
        '<link rel="canonical" href="https://example.com/a">'
        '<link rel="canonical" href="https://example.com/b">'
    )
    assert (
        extract_structured_meta(raw)["canonical"]
        == "https://example.com/a"
    )


def test_malformed_html_degrades_never_raises():
    for raw in (
        "<html><<<>><meta property='og:title' content='x'",
        "",
        "<script type='application/ld+json'>",
        "<div itemscope><span itemprop='a'>unclosed",
    ):
        extract_structured_meta(raw)  # must not raise
