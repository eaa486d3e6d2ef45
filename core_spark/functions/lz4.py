"""LZ4 block decoder, from the public block-format spec
(lz4/lz4 ``lz4_Block_format.md``) — pure stdlib.

Why this exists: same reason as functions/snappy.py — ORC compresses
its own footer with the file's codec (LZ4 is kind 4 in the ORC
spec), so the tail walk needs an LZ4 decoder on the planning path to
plan fetches over LZ4 ORC files. Footers are KB-sized; this is
metadata deframing, not a data-plane codec.

Format (raw/block LZ4 — NOT the frame format): a chain of sequences,
each
- token byte: high nibble = literal length (15 ⇒ extra bytes follow,
  each 255 continues, a byte < 255 terminates), low nibble = match
  length − 4 (same extension rule);
- that many literal bytes;
- 2-byte LE match offset (0 is corrupt; may reach back at most to
  the output start) and the match copy, which may overlap forward
  (offset < length ⇒ the decoded tail repeats).
The final sequence is literals-only: input ends exactly after its
literals.

Corrupt-input discipline: truncation anywhere, a zero or
out-of-range offset, or output disagreeing with the expected size
raises the named Lz4Error — never a hang or a silent short buffer.

Reference parity: gazette moves compressed fragments as opaque bytes
(broker/fragment.go codec suffixes); decoding happens at the
consumer edge, where this runs.
"""

from __future__ import annotations


class Lz4Error(ValueError):
    """Named parse failure: corrupt or non-LZ4 input."""


def _varlen(raw: bytes, i: int, base: int) -> tuple[int, int]:
    """Extend a nibble value of 15 by the 255-continuation rule."""
    n = base
    if base == 15:
        while True:
            if i >= len(raw):
                raise Lz4Error("truncated length extension")
            b = raw[i]
            i += 1
            n += b
            if b < 255:
                break
    return n, i


def lz4_block_decompress(raw: bytes, expected_size: int | None = None) -> bytes:
    """Decode one raw LZ4 block. If ``expected_size`` is given, the
    decoded length must match exactly."""
    out = bytearray()
    i, ln = 0, len(raw)
    if ln == 0:
        raise Lz4Error("empty input")
    while True:
        if i >= ln:
            raise Lz4Error("truncated sequence token")
        token = raw[i]
        i += 1
        lit_len, i = _varlen(raw, i, token >> 4)
        if i + lit_len > ln:
            raise Lz4Error("literals escape the input")
        out += raw[i : i + lit_len]
        i += lit_len
        if i == ln:
            break  # final literals-only sequence
        if i + 2 > ln:
            raise Lz4Error("truncated match offset")
        offset = raw[i] | (raw[i + 1] << 8)
        i += 2
        if offset == 0 or offset > len(out):
            raise Lz4Error("match offset escapes the output")
        mlen, i = _varlen(raw, i, token & 0xF)
        mlen += 4  # minmatch
        start = len(out) - offset
        if offset >= mlen:
            out += out[start : start + mlen]
        else:
            # overlapping match: the decoded tail repeats byte-by-byte
            for k in range(mlen):
                out.append(out[start + k])
        if expected_size is not None and len(out) > expected_size:
            raise Lz4Error("decoded output overruns the expected size")
    if expected_size is not None and len(out) != expected_size:
        raise Lz4Error(
            f"decoded {len(out)} bytes, expected {expected_size}"
        )
    return bytes(out)
