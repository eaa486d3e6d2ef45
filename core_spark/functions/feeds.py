"""RSS 2.0 / Atom 1.0 feed parsing — the discovery surface a crawl
pipeline walks beside sitemaps (q_cc_sitemap) and robots
(q_crawl_robots): feeds announce new content with titles, canonical
entry URLs and timestamps, and a freshness-aware corpus pass reads
them constantly. Public formats only: RSS 2.0 (the RSS Advisory
Board spec — ``<rss><channel><item>`` with RFC 822 pubDates) and
Atom 1.0 (RFC 4287 — ``atom:feed/entry`` with RFC 3339 dates and
rel-typed links, where ``rel="alternate"`` — explicit or defaulted —
is the entry's canonical page and ``rel="self"`` must NOT be taken).

Both date grammars normalize to epoch seconds through stdlib
parsers (``email.utils.parsedate_to_datetime`` for RFC 822,
``datetime.fromisoformat`` for RFC 3339) — two INDEPENDENT
implementations of the hard part, which the DuckDB oracle
recomputes with make_timestamp arithmetic. Titles/summaries pass
through the crawl tier's html_to_text, so CDATA titles and
HTML-escaped description bodies reduce to clean text.

Corrupt-input discipline: a root that is neither ``rss`` nor
``atom:feed``, malformed XML, or an unparseable date raise the
named FeedError — a feed with a wrong timestamp silently shifted a
freshness bucket is exactly the quiet wrong answer this tier
refuses to produce.

Reference parity: gazette/core moves opaque serializations only
(message/interfaces.go:121-124); parsing happens in executor-side
Arrow kernels.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from datetime import datetime, timezone
from email.utils import parsedate_to_datetime

from core_spark.functions.html import html_to_text

_ATOM = "{http://www.w3.org/2005/Atom}"


class FeedError(ValueError):
    """Named parse failure: corrupt or non-feed input."""


def _clean(s: str | None) -> str:
    return html_to_text(s or "")["text"]


def _rfc822_epoch(s: str) -> int:
    try:
        dt = parsedate_to_datetime(s)
    except (TypeError, ValueError) as e:
        raise FeedError(f"bad RFC 822 date {s!r}: {e}")
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return int(dt.timestamp())


def _rfc3339_epoch(s: str) -> int:
    try:
        dt = datetime.fromisoformat(s.replace("Z", "+00:00"))
    except ValueError as e:
        raise FeedError(f"bad RFC 3339 date {s!r}: {e}")
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return int(dt.timestamp())


def parse_feed(raw: str) -> dict:
    """Parse either feed dialect into {kind ('rss'|'atom'),
    feed_title, entries: [{entry_idx, title, url, pub_epoch,
    summary}]} — entries in document order, titles/summaries
    text-cleaned, dates normalized to epoch seconds."""
    try:
        root = ET.fromstring(raw)
    except ET.ParseError as e:
        raise FeedError(f"malformed XML: {e}")
    if root.tag == "rss":
        channel = root.find("channel")
        if channel is None:
            raise FeedError("rss element without channel")
        entries = []
        for item in channel.iter("item"):
            date = item.findtext("pubDate")
            if date is None:
                raise FeedError(
                    f"item {len(entries)} has no pubDate"
                )
            entries.append(
                {
                    "entry_idx": len(entries),
                    "title": _clean(item.findtext("title")),
                    "url": (item.findtext("link") or "").strip(),
                    "pub_epoch": _rfc822_epoch(date),
                    "summary": _clean(item.findtext("description")),
                }
            )
        return {
            "kind": "rss",
            "feed_title": _clean(channel.findtext("title")),
            "entries": entries,
        }
    if root.tag == f"{_ATOM}feed":
        entries = []
        for entry in root.iter(f"{_ATOM}entry"):
            url = ""
            for link in entry.iter(f"{_ATOM}link"):
                rel = link.get("rel", "alternate")  # RFC 4287 §4.2.7.2
                if rel == "alternate":
                    url = link.get("href", "")
                    break
            date = entry.findtext(f"{_ATOM}published") or entry.findtext(
                f"{_ATOM}updated"
            )
            if date is None:
                raise FeedError(
                    f"entry {len(entries)} has neither published"
                    " nor updated"
                )
            summary = entry.findtext(
                f"{_ATOM}summary"
            ) or entry.findtext(f"{_ATOM}content")
            entries.append(
                {
                    "entry_idx": len(entries),
                    "title": _clean(entry.findtext(f"{_ATOM}title")),
                    "url": url.strip(),
                    "pub_epoch": _rfc3339_epoch(date),
                    "summary": _clean(summary),
                }
            )
        return {
            "kind": "atom",
            "feed_title": _clean(root.findtext(f"{_ATOM}title")),
            "entries": entries,
        }
    raise FeedError(f"root element {root.tag!r} is neither rss nor atom feed")


# ------------------------------------------------------------ fixture

_DAYS = ("Mon", "Tue", "Wed", "Thu", "Fri", "Sat", "Sun")
_MONTHS = (
    "Jan", "Feb", "Mar", "Apr", "May", "Jun",
    "Jul", "Aug", "Sep", "Oct", "Nov", "Dec",
)


def _entry_facts(words: list[str], digest: str, i: int):
    title = " ".join(
        words[(i * 4 + k) % len(words)] for k in range(4)
    )
    summary = " ".join(
        words[(i * 7 + k) % len(words)] for k in range(7)
    )
    url = f"https://example.com/e/{digest[:6]}/{i}"
    yy = 2000 + int(digest[1:3], 16) % 26
    mm = 1 + int(digest[3], 16) % 12
    dd = 1 + int(digest[4], 16) % 28
    hh = (int(digest[5], 16) + i) % 24
    mi = int(digest[11:13], 16) % 60
    ss = int(digest[13:15], 16) % 60
    dt = datetime(yy, mm, dd, hh, mi, ss, tzinfo=timezone.utc)
    return title, summary, url, dt


def build_feed_fixture(text: str, digest: str) -> str:
    """Deterministic feed for q_crawl_feed: `2 + digest%4` entries
    whose facts are md5/word arithmetic, the DIALECT/FORM rotating
    on md5 nibble 11 (`digest[10]` % 4):

    - 0 RSS 2.0, plain elements;
    - 1 Atom 1.0, ``published`` dates, plain alternate links;
    - 2 RSS with CDATA titles and HTML-ESCAPED ``<b>`` markup in
      descriptions — the extractor must unescape AND tag-strip back
      to the same clean text as form 0;
    - 3 Atom where every entry carries a ``rel="self"`` link BEFORE
      the ``rel``-less (defaulted-alternate) one, and ``content``
      instead of ``summary`` — taking the first link is wrong.

    RFC 822 dates are hand-rendered with English day/month tables
    (never locale-dependent strftime), RFC 3339 with isoformat."""
    import html as _html

    words = text.split(" ")
    form = int(digest[10], 16) % 4
    n = 2 + int(digest[0:2], 16) % 4
    feed_title = "Feed " + digest[:6]
    if form in (0, 2):
        items = []
        for i in range(n):
            title, summary, url, dt = _entry_facts(words, digest, i)
            date = (
                f"{_DAYS[dt.weekday()]}, {dt.day:02d} "
                f"{_MONTHS[dt.month - 1]} {dt.year:04d} "
                f"{dt.hour:02d}:{dt.minute:02d}:{dt.second:02d} GMT"
            )
            if form == 2:
                t_xml = f"<title><![CDATA[{title}]]></title>"
                d_xml = (
                    "<description>"
                    + _html.escape(f"<b>{summary}</b>")
                    + "</description>"
                )
            else:
                t_xml = f"<title>{title}</title>"
                d_xml = f"<description>{summary}</description>"
            items.append(
                f"<item>{t_xml}<link>{url}</link>"
                f"<guid isPermaLink=\"true\">{url}</guid>"
                f"<pubDate>{date}</pubDate>{d_xml}</item>"
            )
        return (
            '<?xml version="1.0"?><rss version="2.0"><channel>'
            f"<title>{feed_title}</title>"
            f"<link>https://example.com/{digest[:6]}</link>"
            "<description>fixture</description>"
            + "".join(items)
            + "</channel></rss>"
        )
    entries = []
    for i in range(n):
        title, summary, url, dt = _entry_facts(words, digest, i)
        date = dt.strftime("%Y-%m-%dT%H:%M:%SZ")
        links = (
            f'<link rel="self" href="https://example.com/feed.xml"/>'
            f'<link href="{url}"/>'
            if form == 3
            else f'<link rel="alternate" href="{url}"/>'
        )
        body = (
            f'<content type="text">{summary}</content>'
            if form == 3
            else f"<summary>{summary}</summary>"
        )
        entries.append(
            f"<entry><title>{title}</title>{links}"
            f"<id>{url}</id><published>{date}</published>"
            f"{body}</entry>"
        )
    return (
        '<?xml version="1.0"?>'
        '<feed xmlns="http://www.w3.org/2005/Atom">'
        f"<title>{feed_title}</title>"
        f'<id>urn:md5:{digest}</id>'
        f"<updated>2020-01-01T00:00:00Z</updated>"
        + "".join(entries)
        + "</feed>"
    )
