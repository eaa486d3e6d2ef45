"""Feed-parsing pins: both dialects round-trip across the fixture
forms, the real-world traps (CDATA, escaped markup, rel="self"
first, updated-only Atom entries, timezone offsets in RFC 822), and
the named-error discipline for malformed input."""

from __future__ import annotations

import hashlib
from datetime import datetime, timezone

import pytest

from core_spark.functions.feeds import (
    FeedError,
    build_feed_fixture,
    parse_feed,
)

ATOM = "http://www.w3.org/2005/Atom"


def test_all_forms_round_trip():
    seen = set()
    for i in range(160):
        t = " ".join(f"w{i}x{k}" for k in range(4 + i % 31))
        h = hashlib.md5(t.encode()).hexdigest()
        form = int(h[10], 16) % 4
        seen.add(form)
        f = parse_feed(build_feed_fixture(t, h))
        words = t.split(" ")
        assert f["kind"] == ("rss" if form in (0, 2) else "atom")
        assert len(f["entries"]) == 2 + int(h[0:2], 16) % 4
        for j, e in enumerate(f["entries"]):
            assert e["title"] == " ".join(
                words[(j * 4 + k) % len(words)] for k in range(4)
            )
            assert e["url"] == f"https://example.com/e/{h[:6]}/{j}"
    assert seen == {0, 1, 2, 3}


def test_rss_dates_with_offsets_normalize():
    for date, epoch in (
        ("Mon, 02 Jan 2006 15:04:05 GMT", 1136214245),
        ("Mon, 02 Jan 2006 10:04:05 -0500", 1136214245),
        ("Mon, 02 Jan 2006 16:04:05 +0100", 1136214245),
    ):
        raw = (
            '<rss version="2.0"><channel><title>T</title><item>'
            f"<title>e</title><link>u</link><pubDate>{date}</pubDate>"
            "</item></channel></rss>"
        )
        assert parse_feed(raw)["entries"][0]["pub_epoch"] == epoch


def test_atom_rel_self_not_taken():
    raw = (
        f'<feed xmlns="{ATOM}"><title>T</title><entry>'
        '<title>e</title>'
        '<link rel="self" href="https://example.com/feed.xml"/>'
        '<link href="https://example.com/page"/>'
        "<published>2020-05-06T07:08:09Z</published></entry></feed>"
    )
    e = parse_feed(raw)["entries"][0]
    assert e["url"] == "https://example.com/page"
    assert e["pub_epoch"] == int(
        datetime(2020, 5, 6, 7, 8, 9, tzinfo=timezone.utc).timestamp()
    )


def test_atom_updated_fallback_and_offset_dates():
    raw = (
        f'<feed xmlns="{ATOM}"><title>T</title><entry>'
        "<title>e</title><link href=\"u\"/>"
        "<updated>2020-01-02T03:04:05+02:00</updated></entry></feed>"
    )
    e = parse_feed(raw)["entries"][0]
    assert e["pub_epoch"] == int(
        datetime(2020, 1, 2, 1, 4, 5, tzinfo=timezone.utc).timestamp()
    )


def test_cdata_and_escaped_markup_clean():
    raw = (
        '<rss version="2.0"><channel><title>T</title><item>'
        "<title><![CDATA[clean title]]></title><link>u</link>"
        "<pubDate>Mon, 02 Jan 2006 15:04:05 GMT</pubDate>"
        "<description>&lt;b&gt;bold words&lt;/b&gt;</description>"
        "</item></channel></rss>"
    )
    e = parse_feed(raw)["entries"][0]
    assert e["title"] == "clean title"
    assert e["summary"] == "bold words"


def test_malformed_and_unknown_roots_refuse():
    with pytest.raises(FeedError, match="malformed XML"):
        parse_feed("<rss><unclosed")
    with pytest.raises(FeedError, match="neither rss nor atom"):
        parse_feed("<html><body>nope</body></html>")
    with pytest.raises(FeedError, match="without channel"):
        parse_feed('<rss version="2.0"></rss>')


def test_missing_or_bad_dates_refuse():
    with pytest.raises(FeedError, match="no pubDate"):
        parse_feed(
            '<rss version="2.0"><channel><title>T</title>'
            "<item><title>e</title></item></channel></rss>"
        )
    with pytest.raises(FeedError, match="bad RFC 822"):
        parse_feed(
            '<rss version="2.0"><channel><title>T</title><item>'
            "<title>e</title><pubDate>yesterday-ish</pubDate>"
            "</item></channel></rss>"
        )
    with pytest.raises(FeedError, match="neither published nor updated"):
        parse_feed(
            f'<feed xmlns="{ATOM}"><title>T</title>'
            "<entry><title>e</title></entry></feed>"
        )
    with pytest.raises(FeedError, match="bad RFC 3339"):
        parse_feed(
            f'<feed xmlns="{ATOM}"><title>T</title><entry>'
            "<title>e</title><published>06/01/2020</published>"
            "</entry></feed>"
        )
