"""Multistream-bz2 dump walking — the distribution format the large
public encyclopedia corpora ship in (``*-pages-articles-multistream
.xml.bz2``): a concatenation of independent bz2 STREAMS, each
holding a bounded batch of ``<page>`` XML elements, so a reader with
the companion index can seek to one stream's byte offset, inflate
just that stream, and parse ~100 pages — never the whole dump. This
module is both sides of that contract: the stream splitter that
BUILDS the index (offset/length per stream, the ranged-GET unit) and
the page parser that turns one inflated stream into training text.

Pure stdlib: ``bz2.BZ2Decompressor`` splits streams by
``unused_data`` (the same incremental-inflate discipline as the
gzip-member WARC walk in functions/warc.py), ``xml.etree`` parses
pages. A stream is a bare concatenation of ``<page>`` elements (the
real multistream convention — there is no per-stream root), so the
parser wraps the fragment before parsing, exactly what public dump
readers do.

Per-page fields: ``<title>``, ``<ns>``, ``<id>`` and the revision
``<text>``; pages missing title or id are skipped (consumers must
tolerate partial pages); unknown child elements are ignored.

Corrupt-input discipline: bytes that are not a bz2 stream, a stream
that fails to inflate, or a fragment that is not XML raise the named
WikidumpError — never a hang, never fabricated pages.

Reference parity: gazette/core moves opaque serializations only
(message/interfaces.go:121-124); container parsing happens in
executor-side Arrow kernels.
"""

from __future__ import annotations

import bz2
import xml.etree.ElementTree as ET

MAX_STREAMS = 100_000


class WikidumpError(ValueError):
    """Named parse failure: corrupt or non-multistream input."""


# Index-build feed/drain granularity: bounded chunks in, bounded
# (discarded) output per call — O(stream) CPU and O(chunk) memory per
# stream instead of re-inflating the whole remainder per boundary.
_FEED = 1 << 20


def wikidump_streams(raw: bytes) -> list[dict]:
    """Split a multistream file into its bz2 streams — the INDEX
    build: [{stream_idx, off, length}] with absolute byte ranges
    (what the companion ``-index.txt`` encodes as offset:...).
    Raises WikidumpError on non-bz2 bytes or a truncated stream.

    The decompressor is fed bounded chunks and drained with
    ``max_length`` so each boundary costs one pass over that stream's
    bytes and the decompressed output is discarded incrementally —
    never O(streams x total) CPU or a full decompressed copy of the
    remainder held per iteration (the dump-scale contract: ~20 GB /
    ~100k streams per file)."""
    out: list[dict] = []
    off = 0
    n = len(raw)
    while off < n:
        dec = bz2.BZ2Decompressor()
        pos = off
        try:
            while not dec.eof:
                if dec.needs_input:
                    if pos >= n:
                        raise WikidumpError(
                            f"truncated bz2 stream at offset {off}"
                        )
                    chunk = raw[pos : pos + _FEED]
                    pos += len(chunk)
                else:
                    chunk = b""
                dec.decompress(chunk, _FEED)  # bounded, discarded
        except OSError:
            raise WikidumpError(
                f"not a bz2 stream at offset {off}"
            ) from None
        used = (pos - off) - len(dec.unused_data)
        out.append({"stream_idx": len(out), "off": off, "length": used})
        off += used
        if len(out) > MAX_STREAMS:
            raise WikidumpError("implausible stream count")
    return out


def wikidump_pages(stream: bytes) -> list[dict]:
    """One INFLATED stream (a bare ``<page>`` concatenation) →
    [{page_id, ns, title, text}]. Pages without <title> or <id> are
    skipped; a fragment that is not XML raises WikidumpError."""
    xml = bz2.decompress(stream) if stream[:3] == b"BZh" else stream
    try:
        root = ET.fromstring(b"<pages>" + xml + b"</pages>")
    except ET.ParseError as e:
        raise WikidumpError(f"stream is not page XML: {e}") from None
    out = []
    for page in root:
        if page.tag != "page":
            continue
        title = page.findtext("title")
        pid = page.findtext("id")
        if title is None or pid is None:
            continue
        try:
            page_id = int(pid)
        except ValueError:
            continue
        try:
            ns = int(page.findtext("ns", "0") or 0)
        except ValueError:
            ns = 0  # junk ns is tolerated metadata, not identity
        out.append(
            {
                "page_id": page_id,
                "ns": ns,
                "title": title,
                "text": page.findtext("revision/text", "") or "",
            }
        )
    return out


# -------------------------------------------------------------- builder
PAGES_PER_STREAM = 2


def build_wikidump_fixture(text: str, digest: str) -> bytes:
    """Deterministic multistream fixture: the document's words tiled
    ``6 + digest[0]%5`` per page, pages packed 2 per bz2 stream (the
    real format packs 100 — same structure, smaller constant). Page
    i carries title ``Page <digest[:6]>-<i>``, id ``1000 + i`` and
    ns 0, plus a decoy ``<sha1>`` element the parser must ignore.
    All page content derives from (text, md5) arithmetic so a SQL
    oracle recomputes every row; stream byte offsets are
    bz2-dependent and are pinned by slicing tests instead (the
    warc.gz convention)."""
    words = text.split(" ")
    wpp = 6 + int(digest[0], 16) % 5
    npages = max(1, (len(words) + wpp - 1) // wpp)
    pages = []
    for i in range(npages):
        body = " ".join(words[i * wpp : (i + 1) * wpp])
        pages.append(
            f"<page><title>Page {digest[:6]}-{i}</title><ns>0</ns>"
            f"<id>{1000 + i}</id><revision><text>{body}</text>"
            f"<sha1>{digest[:8]}</sha1></revision></page>"
        )
    streams = []
    for s in range(0, npages, PAGES_PER_STREAM):
        frag = "".join(pages[s : s + PAGES_PER_STREAM])
        streams.append(bz2.compress(frag.encode("utf-8"), 9))
    return b"".join(streams)
