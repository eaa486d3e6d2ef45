"""Snappy raw-block decoder, from the public format description
(google/snappy ``format_description.txt``) — pure stdlib.

Why this exists: ORC compresses its OWN metadata (footer, postscript
-adjacent sections) with the file's codec, so an ORC tail walk
(functions/orcfile.py) cannot plan fetches over the most common ORC
files (SNAPPY is the ecosystem default) without a snappy decoder on
the planning path. Footers are KB-sized, so a Python decoder is
plenty: this is metadata deframing, not a data-plane codec.

Format (raw/block snappy — NOT the framing format):
- preamble: uvarint (LE base-128) uncompressed length;
- then tagged elements; tag byte low 2 bits select the type:
  - 00 literal: length-1 in tag>>2 if <60, else tag>>2-59 extra LE
    bytes hold length-1;
  - 01 copy, 1-byte offset: length = 4 + ((tag>>2) & 7), offset =
    ((tag>>5) << 8) | next byte;
  - 10 copy, 2-byte LE offset: length = (tag>>2) + 1;
  - 11 copy, 4-byte LE offset: length = (tag>>2) + 1.
- copies may overlap forward (offset < length ⇒ the decoded tail
  repeats); offset 0 or reaching before the output start is corrupt.

Corrupt-input discipline: every malformed shape (truncated preamble
or element, bad offset, output over- or under-run) raises the named
SnappyError — never a hang or a silent short buffer.

Reference parity: gazette journals carry compressed fragments as
opaque bytes (broker/fragment.go codec suffixes); decoding happens at
the consumer edge, which is exactly where this sits (executor-side
metadata walks).
"""

from __future__ import annotations


class SnappyError(ValueError):
    """Named parse failure: corrupt or non-snappy input."""


def _uvarint(raw: bytes, i: int) -> tuple[int, int]:
    u = shift = 0
    for _ in range(5):  # 32-bit length per the spec
        if i >= len(raw):
            raise SnappyError("truncated length preamble")
        b = raw[i]
        i += 1
        u |= (b & 0x7F) << shift
        if not b & 0x80:
            return u, i
        shift += 7
    raise SnappyError("length preamble varint too long")


def snappy_decompress(raw: bytes) -> bytes:
    """Decode one raw snappy block. Raises SnappyError on any
    malformed shape, including a decoded size that disagrees with
    the preamble."""
    n, i = _uvarint(raw, 0)
    if n > 1 << 31:
        raise SnappyError("implausible uncompressed length")
    out = bytearray()
    ln = len(raw)
    while i < ln:
        tag = raw[i]
        i += 1
        kind = tag & 3
        if kind == 0:  # literal
            l = tag >> 2
            if l >= 60:
                nb = l - 59
                if i + nb > ln:
                    raise SnappyError("truncated literal length")
                l = int.from_bytes(raw[i : i + nb], "little")
                i += nb
            l += 1
            if i + l > ln:
                raise SnappyError("literal escapes the input")
            out += raw[i : i + l]
            i += l
            if len(out) > n:
                raise SnappyError("decoded output overruns the preamble")
            continue
        if kind == 1:  # copy, 1-byte offset
            if i >= ln:
                raise SnappyError("truncated copy element")
            length = 4 + ((tag >> 2) & 0x7)
            offset = ((tag >> 5) << 8) | raw[i]
            i += 1
        elif kind == 2:  # copy, 2-byte offset
            if i + 2 > ln:
                raise SnappyError("truncated copy element")
            length = (tag >> 2) + 1
            offset = int.from_bytes(raw[i : i + 2], "little")
            i += 2
        else:  # copy, 4-byte offset
            if i + 4 > ln:
                raise SnappyError("truncated copy element")
            length = (tag >> 2) + 1
            offset = int.from_bytes(raw[i : i + 4], "little")
            i += 4
        if offset == 0 or offset > len(out):
            raise SnappyError("copy offset escapes the output")
        start = len(out) - offset
        if offset >= length:
            out += out[start : start + length]
        else:
            # overlapping copy: the decoded tail repeats byte-by-byte
            for k in range(length):
                out.append(out[start + k])
        if len(out) > n:
            raise SnappyError("decoded output overruns the preamble")
    if len(out) != n:
        raise SnappyError(
            f"decoded {len(out)} bytes, preamble said {n}"
        )
    return bytes(out)
