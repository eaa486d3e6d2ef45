"""Sitemap-protocol parser discipline (functions/sitemap.py)."""

import pytest

from core_spark.functions.sitemap import (
    SitemapError,
    build_sitemap_fixture,
    parse_sitemap,
)

NS = "http://www.sitemaps.org/schemas/sitemap/0.9"


def test_urlset_fields_and_optionals():
    raw = f"""<?xml version="1.0"?>
    <urlset xmlns="{NS}">
      <url><loc> https://a.com/1 </loc>
           <lastmod>2024-03-09T12:00:00+02:00</lastmod>
           <changefreq>Daily</changefreq><priority>0.8</priority></url>
      <url><loc>https://a.com/2</loc></url>
      <url><priority>0.5</priority></url>
      <url><loc>https://a.com/3</loc>
           <lastmod>last tuesday</lastmod>
           <priority>maximum</priority></url>
    </urlset>"""
    got = parse_sitemap(raw)
    assert got["kind"] == "urlset"
    u = got["urls"]
    # loc-less entry skipped; whitespace stripped; freq lower-cased
    assert [x["loc"] for x in u] == [
        "https://a.com/1", "https://a.com/2", "https://a.com/3"
    ]
    assert u[0] == {
        "loc": "https://a.com/1",
        "lastmod": "2024-03-09",
        "changefreq": "daily",
        "priority_tenths": 8,
    }
    # junk lastmod/priority → None, never an exception
    assert u[2]["lastmod"] is None and u[2]["priority_tenths"] is None
    assert u[1]["changefreq"] is None


def test_index_namespace_agnostic_and_extensions_ignored():
    # no namespace at all, plus an extension element inside <sitemap>
    raw = """<sitemapindex>
      <sitemap><loc>https://a.com/s1.xml</loc>
        <ext:x xmlns:ext="urn:x">ignored</ext:x></sitemap>
      <other>ignored</other>
      <sitemap><loc>https://a.com/s2.xml</loc></sitemap>
    </sitemapindex>"""
    got = parse_sitemap(raw)
    assert got == {
        "kind": "index",
        "sitemaps": ["https://a.com/s1.xml", "https://a.com/s2.xml"],
    }


def test_corrupt_inputs_raise_named_error():
    for bad in (
        "not xml at all",
        "<urlset><url><loc>x</loc>",          # unterminated
        "<html><body>a page</body></html>",   # wrong root
        "",
    ):
        with pytest.raises(SitemapError):
            parse_sitemap(bad)


def test_priority_out_of_range_is_none():
    raw = (
        "<urlset><url><loc>a</loc><priority>1.5</priority></url>"
        "<url><loc>b</loc><priority>-0.1</priority></url></urlset>"
    )
    u = parse_sitemap(raw)["urls"]
    assert [x["priority_tenths"] for x in u] == [None, None]


def test_url_cap_enforced():
    body = "".join(
        f"<url><loc>u{i}</loc></url>" for i in range(50_001)
    )
    with pytest.raises(SitemapError):
        parse_sitemap(f"<urlset>{body}</urlset>")


def test_fixture_roundtrip_matches_arithmetic():
    import hashlib

    digest = hashlib.md5(b"some document text").hexdigest()
    index, children = build_sitemap_fixture(digest)
    idx = parse_sitemap(index)
    assert idx["kind"] == "index" and len(idx["sitemaps"]) == 2
    host = f"https://ex{digest[0:2]}.com"
    for c, loc in enumerate(idx["sitemaps"]):
        assert loc == f"{host}/sitemap{c}.xml"
        got = parse_sitemap(children[loc])
        n = 2 + int(digest[c], 16) % 3
        assert len(got["urls"]) == n
        for i, u in enumerate(got["urls"]):
            assert u["loc"] == f"{host}/s{c}/p{i}"
            if c == 1 and i == n - 1:
                assert u["lastmod"] is None
            else:
                y = 2020 + int(digest[2], 16) % 6
                mo = 1 + (int(digest[3], 16) + i) % 12
                d = 1 + (int(digest[4], 16) + 2 * i + c) % 28
                assert u["lastmod"] == f"{y:04d}-{mo:02d}-{d:02d}"
            assert u["priority_tenths"] == 1 + (int(digest[6], 16) + i) % 9
