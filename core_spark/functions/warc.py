"""WARC (Web ARChive, ISO 28500) record walking — the container
format Common Crawl ships, i.e. the literal first parse of a
100 TB web-corpus pass: WARC record walk → HTTP payload slice →
HTML extraction (functions/html.py) → gates/dedup. Pure stdlib.

Format per the public ISO 28500 / WARC 1.0-1.1 spec: a WARC file is
a sequence of records, each

    WARC/1.0\r\n
    <header-name>: <value>\r\n ...
    \r\n
    <Content-Length octets of block>
    \r\n\r\n

Response records carry an HTTP message as their block; the HTTP
payload starts after the first CRLFCRLF inside the block. The walk
yields per-record metadata plus the ABSOLUTE byte range of the
payload — the same ranged-GET planning discipline as the media
walks: a curation pass can slice exactly the HTML bytes out of
object storage without re-streaming whole archives.

Corrupt-input discipline (the codec-suite rule): malformed version
lines, unparseable Content-Length, or blocks escaping the buffer
raise the named WarcError — never a hang, never fabricated records.

Reference parity: gazette/core moves opaque serializations only
(message/interfaces.go:121-124); container parsing happens in
executor-side Arrow kernels.
"""

from __future__ import annotations


class WarcError(ValueError):
    """Named parse failure: corrupt or non-WARC input."""


_CRLF = b"\r\n"


def warc_records(raw: bytes) -> list[dict]:
    """Walk a WARC file into records: one dict per record —
    {rec_idx, rec_type, target_uri, rec_off (absolute offset of the
    record's version line), block_off, block_len (the record block),
    payload_off, payload_len (for blocks containing an HTTP message:
    the bytes after its header CRLFCRLF; equal to the block
    otherwise)}. Empty input yields []; a stream that is not WARC
    raises WarcError, as does any record whose declared
    Content-Length escapes the buffer."""
    out: list[dict] = []
    off = 0
    n = len(raw)
    while off < n:
        # skip inter-record CRLFs
        while raw[off : off + 2] == _CRLF:
            off += 2
        if off >= n:
            break
        rec_off = off
        eol = raw.find(_CRLF, off)
        if eol < 0:
            raise WarcError(f"unterminated version line at {off}")
        version = raw[off:eol]
        if not version.startswith(b"WARC/"):
            raise WarcError(
                f"expected WARC/ version line at {off}, got "
                f"{version[:20]!r}"
            )
        off = eol + 2
        # headers until blank line
        headers: dict[bytes, bytes] = {}
        while True:
            eol = raw.find(_CRLF, off)
            if eol < 0:
                raise WarcError(f"unterminated header at {off}")
            line = raw[off:eol]
            off = eol + 2
            if line == b"":
                break
            k, _, v = line.partition(b":")
            headers[k.strip().lower()] = v.strip()
        try:
            clen = int(headers[b"content-length"])
        except (KeyError, ValueError):
            raise WarcError(f"record at {rec_off} lacks Content-Length")
        if clen < 0 or off + clen > n:
            raise WarcError(
                f"record block at {off} (+{clen}) escapes the buffer"
            )
        block_off, block_len = off, clen
        block = raw[off : off + clen]
        # HTTP-message blocks: payload starts after CRLFCRLF
        p = block.find(b"\r\n\r\n")
        if block[:5] in (b"HTTP/", b"GET /", b"POST ") and p >= 0:
            payload_off = block_off + p + 4
            payload_len = block_len - (p + 4)
        else:
            payload_off, payload_len = block_off, block_len
        out.append(
            {
                "rec_idx": len(out),
                "rec_type": headers.get(b"warc-type", b"").decode(
                    "latin-1"
                ),
                "target_uri": headers.get(
                    b"warc-target-uri", b""
                ).decode("latin-1"),
                # revisit-record linkage (WARC 1.1 §6.7.2): present
                # on revisit records, empty elsewhere
                "refers_to": headers.get(
                    b"warc-refers-to-target-uri", b""
                ).decode("latin-1"),
                "payload_digest": headers.get(
                    b"warc-payload-digest", b""
                ).decode("latin-1"),
                "rec_off": rec_off,
                "block_off": block_off,
                "block_len": block_len,
                "payload_off": payload_off,
                "payload_len": payload_len,
            }
        )
        off += clen
    return out


def _fixture_records(text: str, digest: str) -> list[bytes]:
    """The shared record list behind both fixture builders: a
    warcinfo record, then `2 + digest%3` response records each
    carrying an HTTP/1.1 message whose body is an HTML page built
    from the document text (functions/html.py build_html_fixture).
    `digest` is md5(text).hexdigest(); record count and URIs derive
    from it so a SQL oracle can recompute the walk."""
    from core_spark.functions.html import build_html_fixture

    nrec = 2 + int(digest[0:2], 16) % 3
    page = build_html_fixture(text, digest).encode("utf-8")

    def record(rtype: str, uri: str, block: bytes) -> bytes:
        hdr = [
            b"WARC/1.0",
            b"WARC-Type: " + rtype.encode(),
            b"WARC-Record-ID: <urn:uuid:" + digest.encode() + b">",
        ]
        if uri:
            hdr.append(b"WARC-Target-URI: " + uri.encode())
        hdr.append(b"Content-Length: " + str(len(block)).encode())
        return (
            b"\r\n".join(hdr) + b"\r\n\r\n" + block + b"\r\n\r\n"
        )

    out = [record("warcinfo", "", b"software: core-spark-fixture\r\n")]
    for i in range(nrec):
        http = (
            b"HTTP/1.1 200 OK\r\n"
            b"Content-Type: text/html\r\n"
            b"Content-Length: " + str(len(page)).encode() + b"\r\n"
            b"\r\n" + page
        )
        out.append(
            record(
                "response", f"https://example.com/{digest[:8]}/{i}", http
            )
        )
    return out


def build_warc_fixture(text: str, digest: str) -> bytes:
    """Deterministic plain (uncompressed) WARC fixture — the full
    Common-Crawl-shaped chain (WARC walk → payload slice → HTML
    extract) on real bytes."""
    return b"".join(_fixture_records(text, digest))


def build_warc_revisit_fixture(text: str, digest: str) -> bytes:
    """build_warc_fixture's records plus one REVISIT record per
    even-indexed response (WARC 1.1 §6.7.2, identical-payload-digest
    profile): the crawler re-fetched the URL, found the payload
    digest unchanged, and stored a bodyless pointer instead of the
    payload — the storage-dedup convention Common Crawl and Heritrix
    write. Each revisit carries WARC-Refers-To-Target-URI (the
    original) and WARC-Payload-Digest (sha256 hex of the original's
    payload; the public convention is sha1 base32 — the algorithm
    prefix names ours) with an EMPTY block (real writers store the
    headers-only truncation; empty keeps the fixture offsets
    closed-form and changes nothing about the linkage semantics)."""
    import hashlib as _hl

    from core_spark.functions.html import build_html_fixture

    recs = _fixture_records(text, digest)
    nrec = 2 + int(digest[0:2], 16) % 3
    page = build_html_fixture(text, digest).encode("utf-8")
    sha = _hl.sha256(page).hexdigest()
    for i in range(0, nrec, 2):
        orig = f"https://example.com/{digest[:8]}/{i}"
        hdr = [
            b"WARC/1.0",
            b"WARC-Type: revisit",
            b"WARC-Record-ID: <urn:uuid:" + digest.encode() + b">",
            b"WARC-Target-URI: " + f"{orig}?recheck".encode(),
            b"WARC-Refers-To-Target-URI: " + orig.encode(),
            b"WARC-Payload-Digest: sha256:" + sha.encode(),
            b"WARC-Profile: http://netpreserve.org/warc/1.1/"
            b"revisit/identical-payload-digest",
            b"Content-Length: 0",
        ]
        recs.append(b"\r\n".join(hdr) + b"\r\n\r\n" + b"\r\n\r\n")
    return b"".join(recs)


def build_warc_gz_fixture(text: str, digest: str) -> bytes:
    """The same records as build_warc_fixture, packaged the way
    Common Crawl actually ships them: one gzip MEMBER per record,
    concatenated (the WARC 1.1 Annex D / .warc.gz convention).
    mtime is pinned to 0 so the bytes are deterministic."""
    import gzip

    return b"".join(
        gzip.compress(r, mtime=0) for r in _fixture_records(text, digest)
    )


def warc_gz_members(raw: bytes) -> list[dict]:
    """Split a .warc.gz into its gzip members: one dict per member —
    {member_idx, member_off, member_len, data (decompressed bytes)}.
    member_off/member_len are the ranged-GET unit of a compressed
    crawl archive (what the Common Crawl index points at: a reader
    must fetch and inflate a whole member to reach its record).
    Not-gzip input, a truncated final member, or garbage between
    members raise the named WarcError."""
    import zlib

    out: list[dict] = []
    off = 0
    n = len(raw)
    while off < n:
        if raw[off : off + 2] != b"\x1f\x8b":
            raise WarcError(
                f"expected gzip member magic at {off}, got "
                f"{raw[off : off + 2]!r}"
            )
        d = zlib.decompressobj(wbits=31)
        try:
            data = d.decompress(raw[off:])
        except zlib.error as e:
            raise WarcError(f"corrupt gzip member at {off}: {e}")
        if not d.eof:
            raise WarcError(f"truncated gzip member at {off}")
        consumed = (n - off) - len(d.unused_data)
        out.append(
            {
                "member_idx": len(out),
                "member_off": off,
                "member_len": consumed,
                "data": data,
            }
        )
        off += consumed
    return out
