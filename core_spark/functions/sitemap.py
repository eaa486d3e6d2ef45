"""Sitemap protocol parsing (sitemaps.org 0.9, the public XML
schema) — the crawl-frontier seed step that sits alongside
robots.txt (functions/robots.py) in the politeness/discovery tier:
a site's sitemapindex names child sitemaps; each child urlset lists
<loc> with optional <lastmod>/<changefreq>/<priority>, and the
crawler turns those into a prioritized fetch frontier.

Pure stdlib (xml.etree.ElementTree), executor-side — the engine
ships opaque strings and the kernel parses them, the same discipline
as the media codecs (reference parity: gazette/core moves opaque
serializations only, message/interfaces.go:121-124).

Semantics implemented (the google/sitemap conventions):

- both document kinds are recognized by ROOT TAG, namespace-agnostic
  (`{ns}sitemapindex` / `{ns}urlset` with any ns, or none — real
  sitemaps disagree about the namespace constantly);
- a <sitemap>/<url> entry without <loc> is skipped (loc is the one
  required field); surrounding whitespace in element text is
  stripped;
- <lastmod> accepts the W3C datetime profile's date prefix
  (YYYY-MM-DD, with or without a time suffix) — anything else
  yields None rather than a parse error;
- <priority> is parsed to TENTHS (int 0..10) to keep downstream
  arithmetic float-free; junk priorities yield None; <changefreq>
  is lower-cased verbatim;
- unknown child elements are ignored (the spec says consumers MUST
  tolerate extensions — image/video/news sitemaps add them);
- a payload that is not well-formed XML, or whose root is neither
  kind, raises the named SitemapError (magic-routing contract).

Size guards: a sitemap is spec-capped at 50k URLs / 50 MB; the
parser enforces the URL cap so a crafted document can't balloon one
task's output.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET

MAX_URLS = 50_000

_DATE_RX = re.compile(r"^(\d{4})-(\d{2})-(\d{2})")


class SitemapError(ValueError):
    """Named parse failure: not a (readable) sitemap document."""


def _local(tag: str) -> str:
    """'{ns}loc' → 'loc' (namespace-agnostic tag match)."""
    return tag.rsplit("}", 1)[-1] if "}" in tag else tag


def _text(el) -> str | None:
    return el.text.strip() if el is not None and el.text else None


def _child(el, name: str):
    for c in el:
        if _local(c.tag) == name:
            return c
    return None


def _lastmod_date(s: str | None) -> str | None:
    """W3C datetime → 'YYYY-MM-DD' date prefix, None on junk."""
    if not s:
        return None
    m = _DATE_RX.match(s)
    if not m:
        return None
    y, mo, d = int(m.group(1)), int(m.group(2)), int(m.group(3))
    if not (1 <= mo <= 12 and 1 <= d <= 31):
        return None
    return f"{y:04d}-{mo:02d}-{d:02d}"


def _priority_tenths(s: str | None) -> int | None:
    if not s:
        return None
    try:
        v = float(s)
    except ValueError:
        return None
    if not (0.0 <= v <= 1.0):
        return None
    return int(round(v * 10))


def parse_sitemap(raw: str) -> dict:
    """Parse one sitemap document.

    Returns {"kind": "index", "sitemaps": [loc, ...]} for a
    sitemapindex, or {"kind": "urlset", "urls": [{"loc", "lastmod",
    "changefreq", "priority_tenths"}, ...]} for a urlset. Raises
    SitemapError on non-XML or an unknown root element.
    """
    try:
        root = ET.fromstring(raw)
    except ET.ParseError as e:
        raise SitemapError(f"not well-formed XML: {e}") from None
    kind = _local(root.tag)
    if kind == "sitemapindex":
        locs = []
        for entry in root:
            if _local(entry.tag) != "sitemap":
                continue
            loc = _text(_child(entry, "loc"))
            if loc:
                locs.append(loc)
            if len(locs) > MAX_URLS:
                raise SitemapError("sitemapindex exceeds the 50k cap")
        return {"kind": "index", "sitemaps": locs}
    if kind == "urlset":
        urls = []
        for entry in root:
            if _local(entry.tag) != "url":
                continue
            loc = _text(_child(entry, "loc"))
            if not loc:
                continue
            urls.append(
                {
                    "loc": loc,
                    "lastmod": _lastmod_date(
                        _text(_child(entry, "lastmod"))
                    ),
                    "changefreq": (
                        (_text(_child(entry, "changefreq")) or "").lower()
                        or None
                    ),
                    "priority_tenths": _priority_tenths(
                        _text(_child(entry, "priority"))
                    ),
                }
            )
            if len(urls) > MAX_URLS:
                raise SitemapError("urlset exceeds the 50k cap")
        return {"kind": "urlset", "urls": urls}
    raise SitemapError(f"unknown sitemap root element <{kind}>")


# -------------------------------------------------------------- builder
_NS = "http://www.sitemaps.org/schemas/sitemap/0.9"
_FREQS = ("daily", "weekly", "monthly")


def build_sitemap_fixture(digest: str) -> tuple[str, dict[str, str]]:
    """Deterministic two-level sitemap tree from an md5 digest:
    a sitemapindex naming two child sitemaps, plus the child urlset
    documents keyed by their loc (the "fetch" a crawler would do).
    Child c carries ``2 + digest[c]%3`` urls; url i in child c has
    loc https://ex<digest[0:2]>.com/s<c>/p<i>, lastmod
    ``(2020 + d2%6)-(1 + (d3+i)%12)-(1 + (d4+2i+c)%28)``,
    changefreq ``FREQS[(d5+i)%3]`` and priority
    ``0.(1 + (d6+i)%9)`` — all integer-arithmetic so a SQL oracle
    recomputes every row. One child omits lastmod on its LAST url
    and the index carries an extension element, so the parser's
    optional-field and unknown-tag paths are exercised on every
    document."""
    host = f"https://ex{digest[0:2]}.com"
    children: dict[str, str] = {}
    child_locs = []
    for c in (0, 1):
        n = 2 + int(digest[c], 16) % 3
        rows = []
        for i in range(n):
            y = 2020 + int(digest[2], 16) % 6
            mo = 1 + (int(digest[3], 16) + i) % 12
            d = 1 + (int(digest[4], 16) + 2 * i + c) % 28
            freq = _FREQS[(int(digest[5], 16) + i) % 3]
            prio = 1 + (int(digest[6], 16) + i) % 9
            lastmod = (
                ""
                if c == 1 and i == n - 1
                else f"<lastmod>{y:04d}-{mo:02d}-{d:02d}T04:00:00Z"
                "</lastmod>"
            )
            rows.append(
                f"<url><loc> {host}/s{c}/p{i} </loc>{lastmod}"
                f"<changefreq>{freq}</changefreq>"
                f"<priority>0.{prio}</priority></url>"
            )
        loc = f"{host}/sitemap{c}.xml"
        child_locs.append(loc)
        children[loc] = (
            '<?xml version="1.0" encoding="UTF-8"?>'
            f'<urlset xmlns="{_NS}">' + "".join(rows) + "</urlset>"
        )
    index = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        f'<sitemapindex xmlns="{_NS}">'
        + "".join(
            f"<sitemap><loc>{loc}</loc>"
            "<ext:meta xmlns:ext=\"urn:x\">ignored</ext:meta>"
            "</sitemap>"
            for loc in child_locs
        )
        + "</sitemapindex>"
    )
    return index, children
