"""Structured-metadata extraction from HTML — the provenance pass a
web-scale corpus pipeline runs beside text extraction (`html.py`):
page title, canonical URL, OpenGraph properties, JSON-LD
(``<script type="application/ld+json">``, the schema.org encoding
most modern CMSes emit) and HTML5 microdata (``itemscope``/
``itemprop``), merged under the precedence real aggregators use —
JSON-LD > microdata > OpenGraph > the bare ``<title>``. These fields
feed dedup keys (canonical URL), temporal curation (datePublished)
and provenance/licensing audits.

Pure stdlib: ``html.parser.HTMLParser`` for the tag stream, ``json``
for LD bodies. Like ``html.py``, HTML is forgiving by design —
malformed markup degrades to best-effort fields — but a JSON-LD
block that fails to parse is REPORTED (``ld_ok=False``), never
silently dropped: the pipeline counts those pages.

JSON-LD handling (the Google structured-data conventions, all
public): the script body may be a single node, a LIST of nodes, or
a ``{"@graph": [...]}`` wrapper; ``@type`` may be a string or a
list; ``author`` may be a string or a ``{"name": ...}`` object. The
first Article-typed node wins.

Reference parity: gazette/core moves opaque serializations only
(message/interfaces.go:121-124); parsing happens in executor-side
Arrow kernels.
"""

from __future__ import annotations

import json
from html.parser import HTMLParser


class _MetaExtractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.title_parts: list[str] = []
        self.canonical: str | None = None
        self.og: dict[str, str] = {}
        self.meta: dict[str, str] = {}
        self.ld_bodies: list[str] = []
        self.scopes: list[dict] = []  # open itemscopes
        self.micro: list[dict] = []  # closed Article-ish scopes
        self._title = 0
        self._ld = False
        self._ld_buf: list[str] = []
        self._capture: tuple[str, str, list[str]] | None = None
        self._scope_tags: list[str] = []

    def handle_starttag(self, tag, attrs):  # noqa: D102
        a = dict(attrs)
        if tag == "title":
            self._title += 1
        elif tag == "meta":
            prop, name = a.get("property"), a.get("name")
            content = a.get("content", "")
            if prop and ":" in prop:
                # RDFa-style property: the og: namespace plus its
                # typed extensions (article:, profile:, …, ogp.me);
                # first value wins, per the OG crawl convention
                self.og.setdefault(prop, content)
            elif name:
                self.meta.setdefault(name.lower(), content)
        elif tag == "link":
            rels = (a.get("rel") or "").lower().split()
            if "canonical" in rels and self.canonical is None:
                self.canonical = a.get("href", "")
        elif tag == "script":
            if (a.get("type") or "").strip().lower() == (
                "application/ld+json"
            ):
                self._ld = True
                self._ld_buf = []
            return
        if "itemscope" in a:
            self.scopes.append(
                {"type": a.get("itemtype", ""), "props": {}}
            )
            self._scope_tags.append(tag)
        prop = a.get("itemprop")
        if prop and self.scopes:
            if "content" in a:
                self.scopes[-1]["props"].setdefault(
                    prop, a["content"]
                )
            elif tag in ("a", "link") and "href" in a:
                self.scopes[-1]["props"].setdefault(prop, a["href"])
            else:
                self._capture = (tag, prop, [])

    def handle_endtag(self, tag):  # noqa: D102
        if tag == "title":
            self._title = max(0, self._title - 1)
        elif tag == "script" and self._ld:
            self._ld = False
            self.ld_bodies.append("".join(self._ld_buf))
        if self._capture and tag == self._capture[0]:
            ctag, prop, buf = self._capture
            if self.scopes:
                self.scopes[-1]["props"].setdefault(
                    prop, " ".join("".join(buf).split())
                )
            self._capture = None
        if self._scope_tags and tag == self._scope_tags[-1]:
            self._scope_tags.pop()
            self.micro.append(self.scopes.pop())

    def handle_data(self, data):  # noqa: D102
        if self._ld:
            self._ld_buf.append(data)
        elif self._title:
            self.title_parts.append(data)
        elif self._capture:
            self._capture[2].append(data)


def _ld_nodes(doc) -> list[dict]:
    if isinstance(doc, list):
        out = []
        for d in doc:
            out.extend(_ld_nodes(d))
        return out
    if isinstance(doc, dict):
        if "@graph" in doc and isinstance(doc["@graph"], list):
            return [n for n in doc["@graph"] if isinstance(n, dict)]
        return [doc]
    return []


def _is_article(node: dict) -> bool:
    t = node.get("@type")
    types = t if isinstance(t, list) else [t]
    return any(
        isinstance(x, str) and x.rsplit("/", 1)[-1] == "Article"
        for x in types
    )


def _author_name(v) -> str | None:
    if isinstance(v, str):
        return v
    if isinstance(v, dict):
        name = v.get("name")
        return name if isinstance(name, str) else None
    if isinstance(v, list) and v:
        return _author_name(v[0])
    return None


def extract_structured_meta(raw: str) -> dict:
    """Extract the provenance fields: {title, canonical, og (dict),
    ld_ok, ld (first Article node's {headline, date, author} or
    empty), micro (first schema.org/Article itemscope's props or
    empty), headline, headline_src, pub_date, author, n_og} —
    the ``headline``/``pub_date``/``author`` triple already merged
    under JSON-LD > microdata > OpenGraph > title precedence, with
    ``headline_src`` naming the winning source ('ld' | 'micro' |
    'og' | 'title' | '')."""
    p = _MetaExtractor()
    p.feed(raw)
    p.close()
    # close any unclosed scopes (forgiving-HTML rule)
    while p.scopes:
        p.micro.append(p.scopes.pop())
    title = " ".join("".join(p.title_parts).split())
    ld_ok = True
    ld: dict = {}
    for body in p.ld_bodies:
        try:
            doc = json.loads(body)
        except ValueError:
            ld_ok = False
            continue
        for node in _ld_nodes(doc):
            if _is_article(node) and not ld:
                ld = {
                    "headline": node.get("headline")
                    if isinstance(node.get("headline"), str)
                    else None,
                    "date": node.get("datePublished")
                    if isinstance(node.get("datePublished"), str)
                    else None,
                    "author": _author_name(node.get("author")),
                }
    micro: dict = {}
    for scope in p.micro:
        if scope["type"].rsplit("/", 1)[-1] == "Article" and not micro:
            micro = scope["props"]
    candidates = [
        ("ld", ld.get("headline")),
        ("micro", micro.get("headline")),
        ("og", p.og.get("og:title")),
        ("title", title or None),
    ]
    headline, headline_src = "", ""
    for src, v in candidates:
        if v:
            headline, headline_src = v, src
            break
    pub_date = (
        ld.get("date")
        or micro.get("datePublished")
        or p.og.get("article:published_time", "")
        or ""
    )
    author = (
        ld.get("author")
        or micro.get("author")
        or p.meta.get("author")
        or ""
    )
    return {
        "title": title,
        "canonical": p.canonical or "",
        "og": p.og,
        "ld_ok": ld_ok,
        "ld": ld,
        "micro": micro,
        "headline": headline,
        "headline_src": headline_src,
        "pub_date": pub_date,
        "author": author,
        "n_og": len(p.og),
    }


# ------------------------------------------------------------ fixture


def build_meta_fixture(text: str, digest: str) -> str:
    """Deterministic page for q_crawl_meta: the metadata SOURCE
    rotates on md5 nibble 8 (`digest[7]` % 4) while the underlying
    facts stay md5/word-derived, so one SQL oracle covers every
    form and the driver run exercises every parse path:

    - 0 OpenGraph only (og:title/og:type/article:published_time +
      meta author);
    - 1 JSON-LD only, a single Article node with a NESTED author
      object;
    - 2 CONFLICT: OpenGraph present with a DIFFERENT (4-word)
      headline AND a ``@graph``-wrapped JSON-LD whose Article node
      must win (headline = 6 words, list-valued @type);
    - 3 microdata only (itemscope Article: headline span, meta
      itemprop date, author span).

    Facts: headline = first 6 words (og variant in form 2: first
    4); date = q_cc_pdf's md5 date arithmetic, ISO-rendered;
    author = 'A. ' + digest[8:12]; canonical =
    https://example.com/p/<digest10>; title tag = 'Doc <digest8>'.
    The body reuses build_html_fixture's paragraph shape so text
    extraction and metadata extraction run over one page."""
    words = text.split(" ")
    form = int(digest[7], 16) % 4
    head6 = " ".join(words[:6])
    head4 = " ".join(words[:4])
    yy = 2000 + int(digest[1:3], 16) % 26
    mm = 1 + int(digest[3], 16) % 12
    dd = 1 + int(digest[4], 16) % 28
    date = f"{yy:04d}-{mm:02d}-{dd:02d}"
    author = "A. " + digest[8:12]
    canonical = "https://example.com/p/" + digest[:10]
    title = "Doc " + digest[:8]
    head_parts = [
        f"<title>{title}</title>",
        f'<link rel="canonical" href="{canonical}">',
        "<style>body{margin:0}</style>",
    ]
    body_extra = ""
    if form in (0, 2):
        og_head = head4 if form == 2 else head6
        head_parts += [
            f'<meta property="og:title" content="{og_head}">',
            '<meta property="og:type" content="article">',
            '<meta property="article:published_time"'
            f' content="{date}">',
            f'<meta property="og:url" content="{canonical}">',
            f'<meta name="author" content="{author}">',
        ]
    if form == 1:
        node = {
            "@context": "https://schema.org",
            "@type": "Article",
            "headline": head6,
            "datePublished": date,
            "author": {"@type": "Person", "name": author},
        }
        head_parts.append(
            '<script type="application/ld+json">'
            + json.dumps(node)
            + "</script>"
        )
    elif form == 2:
        graph = {
            "@context": "https://schema.org",
            "@graph": [
                {"@type": "WebSite", "name": title},
                {
                    "@type": ["Article", "NewsArticle"],
                    "headline": head6,
                    "datePublished": date,
                    "author": author,
                },
            ],
        }
        head_parts.append(
            '<script type="application/ld+json">'
            + json.dumps(graph)
            + "</script>"
        )
    elif form == 3:
        body_extra = (
            '<div itemscope itemtype="https://schema.org/Article">'
            f'<span itemprop="headline">{head6}</span>'
            f'<meta itemprop="datePublished" content="{date}">'
            f'by <span itemprop="author">{author}</span></div>'
        )
    paras = "".join(
        f"<p>{' '.join(words[i : i + 20])}</p>"
        for i in range(0, len(words), 20)
    )
    return (
        "<!DOCTYPE html><html><head>"
        + "".join(head_parts)
        + "</head><body>"
        + body_extra
        + f"<main>{paras}</main>"
        + "</body></html>"
    )
