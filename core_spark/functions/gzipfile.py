"""GZIP (RFC 1952) member walking — the verification tier for
multi-member .gz fragments, gazette's DEFAULT fragment codec
(broker/fragment/stores.go:124-139 names ``.gz`` first;
broker/codecs/codecs.go GZIP content encoding).

A .gz file is one or more concatenated MEMBERS. Per the RFC each
member is:

  header  = 1F 8B, CM(=8 deflate), FLG, MTIME(u32 LE), XFL, OS
            [FEXTRA: XLEN(u16 LE) + subfields (SI1 SI2 LEN data)]
            [FNAME:  zero-terminated Latin-1]
            [FCOMMENT: zero-terminated Latin-1]
            [FHCRC:  u16 LE = CRC32 of the header bytes so far]
  body    = raw DEFLATE (RFC 1951)
  trailer = CRC32(u32 LE, of the UNCOMPRESSED bytes) + ISIZE(u32 LE,
            uncompressed length mod 2^32)

Unlike xz/seekable-zstd, stock gzip carries NO index: the only way
to find a member boundary from the bytes alone is to inflate the
deflate stream. That is exactly what this walker does — it is the
VERIFICATION tier (every trailer CRC32 and ISIZE checked, every
header field surfaced) — while the SPLIT-PLANNING tier
(sources/codec_fragments.py ``jsonl.gz``) relies on a writer-planted
FEXTRA subfield carrying the member's total compressed length, the
same public mechanism the genomics BGZF format uses ('BC' subfield,
SAM spec §4.1): FEXTRA is defined by RFC 1952 §2.3.1.1 precisely so
writers can add such data while every stock reader skips it.

Subfield convention for split planning: SI1 SI2 = ``SL`` ("split
length"), LEN = 4, data = u32 LE total member length in bytes
(header + deflate body + 8-byte trailer). ``gz_member_len`` reads it
from a header prefix without touching the body.

Corrupt-input discipline (the codec-suite rule): bad magic, a
non-deflate CM, reserved FLG bits, fields escaping the buffer, an
FHCRC mismatch, a trailer CRC32/ISIZE mismatch, or a deflate error
raises the named GzipError — never a hang, never fabricated bytes.

Reference parity: gazette fragments are opaque compressed files
served by ranged reads; the broker never parses them
(message/interfaces.go:121-124). Parsing happens executor-side.
"""

from __future__ import annotations

import struct
import zlib

MAGIC = b"\x1f\x8b"
CM_DEFLATE = 8
FTEXT, FHCRC, FEXTRA, FNAME, FCOMMENT = 1, 2, 4, 8, 16
_RESERVED = 0xE0
SPLIT_SI = b"SL"  # writer-planted member-length subfield (see above)
MAX_NAME = 1 << 16


class GzipError(ValueError):
    """Named parse failure: corrupt or non-gzip input."""


def _cstr(raw: bytes, i: int) -> tuple[str, int]:
    """Zero-terminated Latin-1 field (RFC 1952 FNAME/FCOMMENT)."""
    end = raw.find(b"\x00", i, i + MAX_NAME)
    if end < 0:
        raise GzipError("unterminated header string field")
    return raw[i:end].decode("latin-1"), end + 1


def parse_member_header(raw: bytes, i: int = 0) -> dict:
    """Parse ONE member header starting at ``i`` → {mtime, os, flg,
    name, comment, extra: {b'XY': bytes}, hdr_end (absolute offset of
    the deflate body)}. Verifies FHCRC when present."""
    if raw[i : i + 2] != MAGIC:
        raise GzipError("bad gzip magic")
    if len(raw) < i + 10:
        raise GzipError("truncated fixed header")
    cm, flg = raw[i + 2], raw[i + 3]
    if cm != CM_DEFLATE:
        raise GzipError(f"unsupported compression method {cm}")
    if flg & _RESERVED:
        raise GzipError("reserved FLG bits set")
    (mtime,) = struct.unpack_from("<I", raw, i + 4)
    os_id = raw[i + 9]
    j = i + 10
    extra: dict[bytes, bytes] = {}
    if flg & FEXTRA:
        if j + 2 > len(raw):
            raise GzipError("truncated XLEN")
        (xlen,) = struct.unpack_from("<H", raw, j)
        j += 2
        end = j + xlen
        if end > len(raw):
            raise GzipError("extra field escapes the buffer")
        while j < end:
            if j + 4 > end:
                raise GzipError("truncated extra subfield header")
            si, (slen,) = raw[j : j + 2], struct.unpack_from("<H", raw, j + 2)
            j += 4
            if j + slen > end:
                raise GzipError("extra subfield escapes XLEN")
            extra[si] = raw[j : j + slen]
            j += slen
    name = comment = None
    if flg & FNAME:
        name, j = _cstr(raw, j)
    if flg & FCOMMENT:
        comment, j = _cstr(raw, j)
    if flg & FHCRC:
        if j + 2 > len(raw):
            raise GzipError("truncated FHCRC")
        (want,) = struct.unpack_from("<H", raw, j)
        got = zlib.crc32(raw[i:j]) & 0xFFFF
        if want != got:
            raise GzipError(
                f"header CRC16 mismatch (want {want:#06x}, got {got:#06x})"
            )
        j += 2
    return {
        "mtime": mtime,
        "os": os_id,
        "flg": flg,
        "name": name,
        "comment": comment,
        "extra": extra,
        "hdr_end": j,
    }


def gz_member_len(raw: bytes, i: int = 0) -> int:
    """Total byte length of the member at ``i``, read from the
    writer-planted ``SL`` FEXTRA subfield — header bytes only, no
    inflate. Raises GzipError when the subfield is absent (a stock
    writer's member: fall back to gzip_members' inflating walk)."""
    hdr = parse_member_header(raw, i)
    sl = hdr["extra"].get(SPLIT_SI)
    if sl is None:
        raise GzipError("no SL split-length subfield in this member")
    if len(sl) != 4:
        raise GzipError("SL subfield is not a u32")
    (n,) = struct.unpack("<I", sl)
    if n < hdr["hdr_end"] - i + 8:
        raise GzipError("SL member length shorter than its own header")
    return n


def gzip_members(raw: bytes) -> list[dict]:
    """Walk every member, INFLATING each body to find its end (gzip
    has no index — this is the verification tier). Trailer CRC32 and
    ISIZE are VERIFIED against the inflated bytes. Returns, per
    member: {member_idx, h_off, data_off, c_size (total member
    bytes), d_size, crc32, mtime, name, comment, split_len (the SL
    subfield value or None — checked against the walked length when
    present)}."""
    out: list[dict] = []
    i = 0
    while i < len(raw):
        hdr = parse_member_header(raw, i)
        d = zlib.decompressobj(wbits=-15)
        try:
            data = d.decompress(raw[hdr["hdr_end"] :])
        except zlib.error as e:
            raise GzipError(f"deflate body: {e}") from None
        if not d.eof:
            raise GzipError("deflate body runs past EOF")
        body_len = len(raw) - hdr["hdr_end"] - len(d.unused_data)
        t = hdr["hdr_end"] + body_len
        if t + 8 > len(raw):
            raise GzipError("truncated member trailer")
        crc, isize = struct.unpack_from("<II", raw, t)
        if crc != zlib.crc32(data):
            raise GzipError(
                f"member {len(out)} CRC32 mismatch "
                f"(want {crc:#010x}, got {zlib.crc32(data):#010x})"
            )
        if isize != len(data) % (1 << 32):
            raise GzipError(
                f"member {len(out)} ISIZE {isize} != {len(data)}"
            )
        c_size = t + 8 - i
        sl = hdr["extra"].get(SPLIT_SI)
        split_len = None
        if sl is not None:
            if len(sl) != 4:
                raise GzipError("SL subfield is not a u32")
            (split_len,) = struct.unpack("<I", sl)
            if split_len != c_size:
                raise GzipError(
                    f"SL subfield {split_len} disagrees with the "
                    f"walked member length {c_size}"
                )
        out.append(
            {
                "member_idx": len(out),
                "h_off": i,
                "data_off": hdr["hdr_end"],
                "c_size": c_size,
                "d_size": len(data),
                "crc32": crc,
                "mtime": hdr["mtime"],
                "name": hdr["name"],
                "comment": hdr["comment"],
                "split_len": split_len,
            }
        )
        i = t + 8
    if not out:
        raise GzipError("no gzip members")
    return out


def write_member(
    data: bytes,
    *,
    name: str | None = None,
    mtime: int = 0,
    hcrc: bool = False,
    level: int = 6,
) -> bytes:
    """Serialize ONE member carrying the ``SL`` split-length subfield
    (so gz_split_plan can walk it headers-only). MTIME defaults to 0
    for deterministic bytes. Stock readers (stdlib ``gzip``) decode
    the result unchanged — FEXTRA is skip-over data to them."""
    co = zlib.compressobj(level, zlib.DEFLATED, -15)
    body = co.compress(data) + co.flush()
    flg = FEXTRA | (FNAME if name is not None else 0) | (FHCRC if hcrc else 0)
    opt = b""
    if name is not None:
        opt += name.encode("latin-1") + b"\x00"
    xfield = SPLIT_SI + struct.pack("<H", 4)
    fixed = MAGIC + bytes([CM_DEFLATE, flg]) + struct.pack("<I", mtime)
    fixed += bytes([0, 255])  # XFL=0, OS=unknown
    # member length = fixed(10) + XLEN(2) + subfield(8) + opt + hcrc
    # + body + trailer(8)
    total = 10 + 2 + 8 + len(opt) + (2 if hcrc else 0) + len(body) + 8
    hdr = fixed + struct.pack("<H", 8) + xfield + struct.pack("<I", total)
    hdr += opt
    if hcrc:
        hdr += struct.pack("<H", zlib.crc32(hdr) & 0xFFFF)
    trailer = struct.pack("<II", zlib.crc32(data), len(data) % (1 << 32))
    return hdr + body + trailer
