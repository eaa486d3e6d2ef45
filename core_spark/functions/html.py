"""HTML → text extraction with link-density boilerplate removal —
the C4/RefinedWeb/FineWeb-style cleanup every web-scale LLM corpus
pass runs before quality gating and dedup. Pure stdlib
(html.parser.HTMLParser), executor-side: the engine ships opaque
strings and the kernel does the parsing, the same discipline as the
media codecs (reference parity: gazette/core moves opaque
serializations only, message/interfaces.go:121-124).

Model (jusText-lite, Pomikálek 2011): the document streams into
BLOCKS at block-level tag boundaries; per block we track non-space
chars total vs inside <a> anchors; a block whose link density
exceeds 0.5 is boilerplate (nav bars, footers, link farms) and is
dropped; script/style/template/noscript subtrees never contribute
text. <title> is captured separately. Unlike the binary codecs
there is no corrupt-input error path: HTML is forgiving by design
and HTMLParser is a recovering tokenizer — malformed input degrades
to best-effort text, never an exception or a hang.
"""

from __future__ import annotations

import html as _html
from html.parser import HTMLParser

_SKIP = {"script", "style", "noscript", "template"}
_BLOCK = {
    "p", "div", "li", "ul", "ol", "dl", "dt", "dd", "nav", "footer",
    "header", "aside", "section", "article", "main", "body", "h1",
    "h2", "h3", "h4", "h5", "h6", "table", "tr", "td", "th",
    "blockquote", "pre", "form", "figure", "figcaption", "hr", "br",
}
_LINK_DENSITY_MAX = 0.5


class _TextExtractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[tuple[str, int, int]] = []  # (text, ns, link_ns)
        self.title_parts: list[str] = []
        self.n_links = 0
        self._buf: list[str] = []
        self._total_ns = 0
        self._link_ns = 0
        self._skip = 0
        self._link = 0
        self._title = 0

    def _flush(self) -> None:
        txt = " ".join("".join(self._buf).split())
        if txt:
            self.blocks.append((txt, self._total_ns, self._link_ns))
        self._buf = []
        self._total_ns = 0
        self._link_ns = 0

    def handle_starttag(self, tag, attrs):  # noqa: D102
        if tag in _SKIP:
            self._skip += 1
            return
        if self._skip:
            return
        if tag == "title":
            self._title += 1
        elif tag == "a":
            self.n_links += 1
            self._link += 1
        elif tag in _BLOCK:
            self._flush()

    def handle_endtag(self, tag):  # noqa: D102
        if tag in _SKIP:
            self._skip = max(0, self._skip - 1)
            return
        if self._skip:
            return
        if tag == "title":
            self._title = max(0, self._title - 1)
        elif tag == "a":
            self._link = max(0, self._link - 1)
        elif tag in _BLOCK:
            self._flush()

    def handle_data(self, data):  # noqa: D102
        if self._skip:
            return
        if self._title:
            self.title_parts.append(data)
            return
        self._buf.append(data)
        ns = len("".join(data.split()))
        self._total_ns += ns
        if self._link:
            self._link_ns += ns


def html_to_text(raw: str) -> dict:
    """Extract clean text from an HTML document. Returns {title,
    text (kept blocks joined by single spaces, whitespace
    collapsed), n_links (total <a> count), blocks_kept,
    blocks_dropped}. A block is dropped when over half its non-space
    characters sit inside anchors — the link-density boilerplate
    test that removes navigation, footers and link farms while
    keeping prose that merely contains links."""
    p = _TextExtractor()
    p.feed(raw)
    p.close()
    p._flush()
    kept = [
        t for t, ns, link_ns in p.blocks
        if ns == 0 or link_ns / ns <= _LINK_DENSITY_MAX
    ]
    return {
        "title": " ".join("".join(p.title_parts).split()),
        "text": " ".join(kept),
        "n_links": p.n_links,
        "blocks_kept": len(kept),
        "blocks_dropped": len(p.blocks) - len(kept),
    }


def build_html_fixture(text: str, digest: str) -> str:
    """Deterministic page fixture for the oracle-checked query: the
    document text in 20-word <p> blocks (escaped, so extraction must
    unescape) wrapped in the real boilerplate shapes — head with
    title/style/script, a <nav> of `3 + digest%7` links, a 2-link
    footer. `digest` is md5(text).hexdigest() so a SQL oracle
    recomputes every derived field; extraction recovers the original
    text exactly."""
    k = 3 + int(digest[0:2], 16) % 7
    title = "Doc " + digest[:8]
    words = text.split(" ")
    paras = [
        " ".join(words[i : i + 20]) for i in range(0, len(words), 20)
    ]
    nav = (
        "<nav>"
        + " ".join(f'<a href="/{i}">lnk{i}</a>' for i in range(k))
        + "</nav>"
    )
    body = "".join(f"<p>{_html.escape(p)}</p>" for p in paras if p)
    return (
        "<!DOCTYPE html><html><head>"
        f"<title>{title}</title>"
        "<style>body{margin:0;font:16px serif}</style>"
        f"<script>var track={int(digest[2:6], 16)};</script>"
        "</head><body>"
        f"<header>{nav}</header>"
        f"<main>{body}</main>"
        '<footer><a href="/about">about</a> '
        '<a href="/contact">contact</a></footer>'
        "</body></html>"
    )


class _LinkExtractor(HTMLParser):
    """Collect (href, anchor_text) pairs, skipping script/style
    subtrees, collapsing anchor whitespace, unescaping entities via
    convert_charrefs."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.links: list[tuple[str, str]] = []
        self._skip = 0
        self._href: str | None = None
        self._text: list[str] = []

    def handle_starttag(self, tag, attrs):  # noqa: D102
        if tag in _SKIP:
            self._skip += 1
            return
        if tag == "a" and self._skip == 0:
            self._href = dict(attrs).get("href") or ""
            self._text = []

    def handle_endtag(self, tag):  # noqa: D102
        if tag in _SKIP:
            self._skip = max(0, self._skip - 1)
            return
        if tag == "a" and self._href is not None:
            self.links.append(
                (self._href, " ".join("".join(self._text).split()))
            )
            self._href = None

    def handle_data(self, data):  # noqa: D102
        if self._href is not None and self._skip == 0:
            self._text.append(data)


def extract_links(raw: str) -> list[tuple[str, str]]:
    """All (href, anchor_text) pairs in document order — the edge
    emitter for crawl link-graph construction."""
    p = _LinkExtractor()
    p.feed(raw)
    p.close()
    return p.links


def build_link_fixture(text: str, digest: str) -> str:
    """Page fixture for the link-graph query: the nav/footer internal
    links of build_html_fixture plus `2 + digest[3]%3` external
    content links whose target hosts and anchor words are md5-derived
    so a SQL oracle recomputes the exact edge list."""
    words = text.split(" ")
    m = 2 + int(digest[3], 16) % 3
    ext = " ".join(
        f'<a href="https://example{digest[4 + 2 * j:6 + 2 * j]}.org'
        f'/p{j}">{_html.escape(words[j] if j < len(words) else "x")}</a>'
        f" {_html.escape(' '.join(words[j * 5:j * 5 + 4]))}"
        for j in range(m)
    )
    base = build_html_fixture(text, digest)
    return base.replace("</main>", f"<p>{ext}</p></main>")
