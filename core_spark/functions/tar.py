"""POSIX ustar shard walking — the WebDataset convention: a training
corpus ships as tar shards whose members group into samples by key
(`<key>.txt`, `<key>.cls`, `<key>.jpg`, …), and a loader plans
ranged GETs straight at member data offsets instead of streaming
whole shards. Pure stdlib byte walking (not the tarfile module on
the read side, so offsets and checksums are verified against the
format itself).

Format per the public POSIX.1-1988 ustar spec: 512-byte header
blocks (name 100, mode 8, uid 8, gid 8, size 12 octal, mtime 12,
chksum 8, typeflag 1, linkname 100, magic "ustar\\0" + version "00",
…), data padded to 512, archive terminated by two zero blocks. The
header checksum is the unsigned sum of the header bytes with the
chksum field read as spaces — verified on every member.

Corrupt-input discipline (the codec-suite rule): a bad magic, an
unparseable size, a checksum mismatch, or data escaping the buffer
raise the named TarError — never a hang, never fabricated members.

Reference parity: gazette/core moves opaque serializations only
(message/interfaces.go:121-124); container parsing happens in
executor-side Arrow kernels.
"""

from __future__ import annotations

_BLOCK = 512


class TarError(ValueError):
    """Named parse failure: corrupt or non-ustar input."""


def _octal(field: bytes, what: str, off: int) -> int:
    s = field.split(b"\0", 1)[0].strip(b" \0")
    if not s:
        return 0
    try:
        return int(s, 8)
    except ValueError:
        raise TarError(f"unparseable octal {what} at header {off}")


def tar_members(raw: bytes) -> list[dict]:
    """Walk a ustar archive into members: one dict per member —
    {member_idx, name, size, header_off, data_off} with the header
    checksum verified. Stops at the two-zero-block terminator (or
    clean EOF); anything malformed raises TarError."""
    out: list[dict] = []
    off = 0
    n = len(raw)
    while off + _BLOCK <= n:
        hdr = raw[off : off + _BLOCK]
        if hdr == b"\0" * _BLOCK:  # terminator
            break
        if hdr[257:262] != b"ustar":
            raise TarError(f"bad ustar magic at header {off}")
        stored = _octal(hdr[148:156], "chksum", off)
        unsigned = sum(hdr[:148]) + 8 * 0x20 + sum(hdr[156:])
        if stored != unsigned:
            raise TarError(
                f"header checksum mismatch at {off}: "
                f"{stored} != {unsigned}"
            )
        size = _octal(hdr[124:136], "size", off)
        data_off = off + _BLOCK
        if data_off + size > n:
            raise TarError(
                f"member data at {data_off} (+{size}) escapes the buffer"
            )
        name = hdr[0:100].split(b"\0", 1)[0].decode("utf-8", "replace")
        prefix = hdr[345:500].split(b"\0", 1)[0].decode("utf-8", "replace")
        if prefix:
            name = prefix + "/" + name
        if hdr[156:157] in (b"0", b"\0"):  # regular files only
            out.append(
                {
                    "member_idx": len(out),
                    "name": name,
                    "size": size,
                    "header_off": off,
                    "data_off": data_off,
                }
            )
        off = data_off + ((size + _BLOCK - 1) // _BLOCK) * _BLOCK
    else:
        if off != n:
            raise TarError(f"truncated header block at {off}")
    return out


def _ustar_header(name: str, size: int) -> bytes:
    """Deterministic ustar header: mode 0644, uid/gid 0, mtime 0."""
    nb = name.encode("utf-8")
    if len(nb) > 100:
        raise TarError(f"member name too long for ustar: {name!r}")
    hdr = bytearray(_BLOCK)
    hdr[0 : len(nb)] = nb
    hdr[100:108] = b"0000644\0"
    hdr[108:116] = b"0000000\0"
    hdr[116:124] = b"0000000\0"
    hdr[124:136] = b"%011o\0" % size
    hdr[136:148] = b"00000000000\0"
    hdr[148:156] = b" " * 8  # chksum: spaces while summing
    hdr[156:157] = b"0"
    hdr[257:263] = b"ustar\0"
    hdr[263:265] = b"00"
    chk = sum(hdr)
    hdr[148:156] = b"%06o\0 " % chk
    return bytes(hdr)


def build_webdataset_fixture(text: str, digest: str) -> bytes:
    """Deterministic WebDataset-shaped tar shard: `2 + digest%3`
    samples, each contributing `<digest8>-<i>.txt` (an 8-word slice
    of the document, wrapping) and `<digest8>-<i>.cls` (one digit,
    `(digest+i) % 10`). Every field that affects the byte layout
    (names, sizes, member order) derives from md5(text), so a SQL
    oracle recomputes member offsets from the ustar layout arithmetic
    alone: header 512 + data padded to 512 per member, samples in
    order, .txt before .cls."""
    words = text.split(" ")
    nsamp = 2 + int(digest[0:2], 16) % 3
    key8 = digest[:8]
    parts: list[bytes] = []
    for i in range(nsamp):
        chunk = [
            words[(i * 8 + k) % len(words)] for k in range(8)
        ]
        txt = " ".join(chunk).encode("utf-8")
        cls = str((int(digest[0:2], 16) + i) % 10).encode("ascii")
        for name, data in (
            (f"{key8}-{i}.txt", txt),
            (f"{key8}-{i}.cls", cls),
        ):
            parts.append(_ustar_header(name, len(data)))
            parts.append(data)
            pad = (-len(data)) % _BLOCK
            parts.append(b"\0" * pad)
    parts.append(b"\0" * (2 * _BLOCK))
    return b"".join(parts)
