"""XZ container walking — tail-only split planning for .xz corpora
(the xz file format spec, xz-file-format.txt): an .xz file is one or
more concatenated STREAMS, and each stream ends with an INDEX (per-
block unpadded/uncompressed sizes) plus a 12-byte footer whose
backward-size field locates that index — so a planner can walk the
WHOLE file backward from its tail, stream by stream, and produce
ranged-GET splits with per-split uncompressed sizes without reading
any payload bytes: the parquet-footer/zstd-seekable discipline
applied to the container Wikipedia-class dumps and many public
corpora actually ship in.

Layout per the spec:
  stream = header(6-byte magic FD 37 7A 58 5A 00 + 2 stream flags +
           CRC32) … blocks (each padded to 4) … index … footer
  footer = CRC32(over the next 6 bytes) + backward_size/4-1 (u32 LE)
           + stream flags (2) + "YZ"
  index  = 0x00 indicator, block count (varint), per block
           (unpadded_size, uncompressed_size) varints, pad-to-4,
           CRC32
Streams may be separated by stream padding (4-byte zero words).

Integrity is VERIFIED, not assumed: footer and index CRC32s are
checked (stdlib zlib.crc32), the two stream-flag copies must agree,
backward size must 4-align, and block layout must land exactly on
the stream header — a stale or spliced index raises, never
mis-splits. Payload DECODE is stdlib ``lzma`` (python ships the xz
codec, unlike zstd), so the point-lookup path — fetch one stream's
byte range, decompress just it — needs nothing beyond this walk.

Corrupt-input discipline: bad magic, reserved flags, CRC mismatches,
varints running past their region, or sizes escaping the buffer
raise the named XzError.

Reference parity: gazette fragments are opaque compressed files
served by ranged reads (broker/fragment.go codec suffixes); this is
the consumer-edge split planner for XZ fragments.
"""

from __future__ import annotations

import struct
import zlib

HEADER_MAGIC = b"\xfd7zXZ\x00"
FOOTER_MAGIC = b"YZ"
# check-type id -> size of the per-block check field
_CHECK_SIZES = {0: 0, 1: 4, 4: 8, 10: 32}
MAX_BLOCKS = 1_000_000


class XzError(ValueError):
    """Named parse failure: corrupt or non-xz input."""


def _varint(raw: bytes, i: int, end: int) -> tuple[int, int]:
    u = shift = 0
    for _ in range(9):
        if i >= end:
            raise XzError("varint escapes the index")
        b = raw[i]
        i += 1
        u |= (b & 0x7F) << shift
        if not b & 0x80:
            return u, i
        shift += 7
    raise XzError("varint longer than 9 bytes")


def _parse_index(raw: bytes, start: int, end: int) -> list[tuple[int, int]]:
    """Index region [start:end) → [(unpadded_size, uncompressed_size)]
    with its CRC32 verified."""
    if end - start < 8 or raw[start] != 0x00:
        raise XzError("missing index indicator")
    (want_crc,) = struct.unpack_from("<I", raw, end - 4)
    if zlib.crc32(raw[start : end - 4]) != want_crc:
        raise XzError("index CRC32 mismatch")
    i = start + 1
    count, i = _varint(raw, i, end - 4)
    if count > MAX_BLOCKS:
        raise XzError("implausible block count")
    records = []
    for _ in range(count):
        unpadded, i = _varint(raw, i, end - 4)
        uncompressed, i = _varint(raw, i, end - 4)
        if unpadded == 0:
            raise XzError("zero unpadded size in the index")
        records.append((unpadded, uncompressed))
    # padding to a 4-byte boundary, zeros only
    while (i - start) % 4:
        if i >= end - 4 or raw[i] != 0:
            raise XzError("nonzero index padding")
        i += 1
    if i != end - 4:
        raise XzError("index size disagrees with its records")
    return records


def xz_streams(raw: bytes) -> list[dict]:
    """Walk a (possibly concatenated) .xz file BACKWARD from the
    tail: [{stream_idx, off, length, check, blocks: [{block_idx,
    off, unpadded, padded, d_off, d_size}]}] — the ranged-GET split
    plan, one tail read per stream, no payload bytes touched.
    Stream order in the result is file order."""
    out: list[dict] = []
    end = len(raw)
    while end > 0:
        # stream padding: 4-byte zero words between streams
        while end >= 4 and raw[end - 4 : end] == b"\x00\x00\x00\x00":
            end -= 4
        if end == 0:
            break
        if end < 32:
            raise XzError("too short for an xz stream")
        if raw[end - 2 : end] != FOOTER_MAGIC:
            raise XzError("missing stream-footer magic")
        (want_crc,) = struct.unpack_from("<I", raw, end - 12)
        if zlib.crc32(raw[end - 8 : end - 2]) != want_crc:
            raise XzError("stream-footer CRC32 mismatch")
        (bw,) = struct.unpack_from("<I", raw, end - 8)
        flags = raw[end - 4 : end - 2]
        if flags[0] != 0 or flags[1] & 0xF0:
            raise XzError("reserved stream-flag bits set")
        check = flags[1] & 0x0F
        if check not in _CHECK_SIZES:
            raise XzError(f"unknown check type {check}")
        index_size = (bw + 1) * 4
        index_start = end - 12 - index_size
        if index_start < 12:
            raise XzError("index escapes the stream")
        records = _parse_index(raw, index_start, end - 12)
        body = sum((u + 3) // 4 * 4 for u, _ in records)
        start = index_start - body - 12
        if start < 0:
            raise XzError("stream blocks escape the buffer")
        if raw[start : start + 6] != HEADER_MAGIC:
            raise XzError("missing stream-header magic")
        if raw[start + 6 : start + 8] != flags:
            raise XzError("stream header/footer flags disagree")
        (hdr_crc,) = struct.unpack_from("<I", raw, start + 8)
        if zlib.crc32(raw[start + 6 : start + 8]) != hdr_crc:
            raise XzError("stream-header CRC32 mismatch")
        blocks = []
        boff = start + 12
        d_off = 0
        for bi, (u, d) in enumerate(records):
            blocks.append(
                {
                    "block_idx": bi,
                    "off": boff,
                    "unpadded": u,
                    "padded": (u + 3) // 4 * 4,
                    "d_off": d_off,
                    "d_size": d,
                }
            )
            boff += (u + 3) // 4 * 4
            d_off += d
        out.append(
            {
                "stream_idx": 0,  # renumbered below (backward walk)
                "off": start,
                "length": end - start,
                "check": check,
                "blocks": blocks,
            }
        )
        end = start
    if not out:
        raise XzError("no xz streams in the input")
    out.reverse()
    for si, s in enumerate(out):
        s["stream_idx"] = si
    return out
