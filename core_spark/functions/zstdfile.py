"""Zstandard FRAME walking (RFC 8878) — metadata only, no
decompressor on the planning path.

Why: .zst is the other container large text corpora ship in beside
.gz/.bz2 (the public crawl-derived datasets moved to zstd), and a
frame-concatenated .zst file has exactly the gzip-member/WARC
property: each frame is independently decodable, so the FRAME is the
ranged-GET/split unit — a reader that knows frame byte ranges can
fan one file out across executors. This walker builds that index
from the headers alone: magic, frame-header descriptor, window
descriptor, dictionary id, frame content size, then the block chain
(3-byte LE headers: last/type/size) WITHOUT inflating anything —
block sizes are in the headers, which is the point: planning cost is
per-block-header, not per-byte.

Skippable frames (magic 0x184D2A50..5F, 4-byte LE size) are walked
and reported — real tools embed seek tables and metadata in them.

Builder: ``build_zstd_frames`` emits REAL single-segment zstd frames
whose blocks are Raw_Block literals — valid per RFC 8878 §3.1.1
(tests pin them against pyarrow's zstd decompressor), with closed-
form layout (9-byte header + 3 bytes per block + content) so oracles
recompute every offset by arithmetic.

Corrupt-input discipline: bad magic, reserved bits/block type,
truncation anywhere, or a block escaping the buffer raise the named
ZstdError — never a hang or a fabricated plan. Actual DECOMPRESSION
of compressed blocks is out of scope and raises nothing here — this
module never inflates; install the public ``zstandard`` library for
payload decode (columns.py's stub discipline).

Reference parity: gazette stores compressed fragments as opaque
bytes and serves ranged reads (broker/fragment.go codec suffixes,
fragment index); planning over container internals happens at the
consumer edge, which is exactly where this walker runs.
"""

from __future__ import annotations

import struct

MAGIC = 0xFD2FB528
SKIP_MAGIC_LO = 0x184D2A50
SKIP_MAGIC_HI = 0x184D2A5F
MAX_FRAMES = 1_000_000
MAX_BLOCKS = 10_000_000

_RAW, _RLE, _COMPRESSED, _RESERVED = 0, 1, 2, 3


class ZstdError(ValueError):
    """Named parse failure: corrupt or non-zstd input."""


def _u32(raw: bytes, i: int) -> int:
    if i + 4 > len(raw):
        raise ZstdError("truncated u32")
    return struct.unpack_from("<I", raw, i)[0]


def _frame_header(raw: bytes, i: int) -> tuple[dict, int]:
    """Parse one zstd frame header starting AFTER the magic; returns
    (fields, next offset)."""
    if i >= len(raw):
        raise ZstdError("truncated frame header descriptor")
    fhd = raw[i]
    i += 1
    fcs_flag = fhd >> 6
    single_segment = bool(fhd & 0x20)
    if fhd & 0x08:
        raise ZstdError("reserved frame-header bit set")
    has_checksum = bool(fhd & 0x04)
    did_flag = fhd & 0x03
    window_size = None
    if not single_segment:
        if i >= len(raw):
            raise ZstdError("truncated window descriptor")
        wd = raw[i]
        i += 1
        exponent, mantissa = wd >> 3, wd & 7
        base = 1 << (10 + exponent)
        window_size = base + (base // 8) * mantissa
    did_bytes = (0, 1, 2, 4)[did_flag]
    dict_id = 0
    if did_bytes:
        if i + did_bytes > len(raw):
            raise ZstdError("truncated dictionary id")
        dict_id = int.from_bytes(raw[i : i + did_bytes], "little")
        i += did_bytes
    fcs_bytes = (1 if single_segment else 0, 2, 4, 8)[fcs_flag]
    content_size = None
    if fcs_bytes:
        if i + fcs_bytes > len(raw):
            raise ZstdError("truncated frame content size")
        content_size = int.from_bytes(raw[i : i + fcs_bytes], "little")
        if fcs_bytes == 2:
            content_size += 256
        i += fcs_bytes
    if single_segment:
        window_size = content_size
    return (
        {
            "window_size": window_size,
            "dict_id": dict_id,
            "content_size": content_size,
            "has_checksum": has_checksum,
        },
        i,
    )


def _walk_blocks(raw: bytes, i: int) -> tuple[int, int]:
    """Walk the block chain from i; returns (n_blocks, next offset)."""
    n = 0
    while True:
        if i + 3 > len(raw):
            raise ZstdError("truncated block header")
        hdr = raw[i] | (raw[i + 1] << 8) | (raw[i + 2] << 16)
        i += 3
        last, btype, bsize = hdr & 1, (hdr >> 1) & 3, hdr >> 3
        if btype == _RESERVED:
            raise ZstdError("reserved block type")
        # RLE block content is ONE byte regardless of Block_Size
        body = 1 if btype == _RLE else bsize
        if i + body > len(raw):
            raise ZstdError("block escapes the buffer")
        i += body
        n += 1
        if n > MAX_BLOCKS:
            raise ZstdError("implausible block count")
        if last:
            return n, i


def zstd_frames(raw: bytes) -> list[dict]:
    """Frame index of a (possibly concatenated) .zst file:
    [{frame_idx, off, length, kind, content_size, window_size,
    dict_id, n_blocks, has_checksum}] — the split plan. Skippable
    frames report kind='skippable' with their payload size as
    content_size and None block/window fields."""
    out: list[dict] = []
    i = 0
    ln = len(raw)
    while i < ln:
        off = i
        magic = _u32(raw, i)
        i += 4
        if SKIP_MAGIC_LO <= magic <= SKIP_MAGIC_HI:
            size = _u32(raw, i)
            i += 4
            if i + size > ln:
                raise ZstdError("skippable frame escapes the buffer")
            i += size
            out.append(
                {
                    "frame_idx": len(out),
                    "off": off,
                    "length": i - off,
                    "kind": "skippable",
                    "content_size": size,
                    "window_size": None,
                    "dict_id": None,
                    "n_blocks": None,
                    "has_checksum": False,
                }
            )
        elif magic == MAGIC:
            hdr, i = _frame_header(raw, i)
            n_blocks, i = _walk_blocks(raw, i)
            if hdr["has_checksum"]:
                if i + 4 > ln:
                    raise ZstdError("truncated content checksum")
                i += 4
            out.append(
                {
                    "frame_idx": len(out),
                    "off": off,
                    "length": i - off,
                    "kind": "zstd",
                    "content_size": hdr["content_size"],
                    "window_size": hdr["window_size"],
                    "dict_id": hdr["dict_id"],
                    "n_blocks": n_blocks,
                    "has_checksum": hdr["has_checksum"],
                }
            )
        else:
            raise ZstdError(f"bad frame magic at offset {off}")
        if len(out) > MAX_FRAMES:
            raise ZstdError("implausible frame count")
    return out


# -------------------------------------------------------------- builder
RAW_BLOCK_MAX = 64  # fixture raw-block payload cap (closed-form layout)


def build_zstd_frames(content: bytes, k: int) -> bytes:
    """Split ``content`` into k contiguous chunks (sizes
    ``len//k`` + 1 for the first ``len%k``) and emit one REAL
    single-segment zstd frame per chunk, each a chain of Raw_Block
    literals of ≤ RAW_BLOCK_MAX bytes — decodable by any conformant
    zstd (pinned against pyarrow's), with arithmetic layout:
    frame = 4 magic + 1 FHD + 4 FCS + 3 per block + chunk bytes."""
    if k < 1 or k > len(content):
        raise ValueError("k out of range")
    base, rem = divmod(len(content), k)
    out = bytearray()
    pos = 0
    for fi in range(k):
        ln = base + (1 if fi < rem else 0)
        chunk = content[pos : pos + ln]
        pos += ln
        out += struct.pack("<I", MAGIC)
        # FHD: FCS flag 2 (4-byte), single-segment, no checksum/dict
        out += bytes([(2 << 6) | 0x20])
        out += struct.pack("<I", ln)
        nb = max(1, (ln + RAW_BLOCK_MAX - 1) // RAW_BLOCK_MAX)
        for bi in range(nb):
            blk = chunk[bi * RAW_BLOCK_MAX : (bi + 1) * RAW_BLOCK_MAX]
            hdr = (len(blk) << 3) | (_RAW << 1) | (1 if bi == nb - 1 else 0)
            out += bytes([hdr & 0xFF, (hdr >> 8) & 0xFF, (hdr >> 16) & 0xFF])
            out += blk
    return bytes(out)


def build_skippable(payload: bytes, nibble: int = 0) -> bytes:
    """One skippable frame (magic 0x184D2A5<nibble>) carrying
    ``payload`` — the seek-table/metadata convention."""
    if not 0 <= nibble <= 0xF:
        raise ValueError("nibble out of range")
    return (
        struct.pack("<I", SKIP_MAGIC_LO | nibble)
        + struct.pack("<I", len(payload))
        + payload
    )


# ----------------------------------------------------- seekable format
# The public zstd "seekable format" (zstd contrib): regular frames
# followed by ONE skippable frame (magic nibble 0xE) whose payload is
# a seek table — per-frame (compressed_size, decompressed_size[,
# checksum]) entries and a 9-byte footer (u32 frame count, u8
# descriptor, u32 seekable magic). A reader fetches the TAIL, not the
# body: the seek table alone turns one multi-GB .zst into ranged-GET
# splits with per-split decompressed offsets.
SEEKABLE_MAGIC = 0x8F92EAB1
SEEK_NIBBLE = 0xE


def zstd_seek_table(raw: bytes) -> list[dict]:
    """Parse the seekable-format seek table from the file TAIL:
    [{frame_idx, c_off, c_size, d_off, d_size}] with cumulative
    compressed/decompressed offsets — the split plan. Raises
    ZstdError on a missing/corrupt table."""
    n = len(raw)
    if n < 17:
        raise ZstdError("too short for a seekable footer")
    if _u32(raw, n - 4) != SEEKABLE_MAGIC:
        raise ZstdError("missing seekable magic")
    desc = raw[n - 5]
    if desc & 0x7F:
        raise ZstdError("reserved seek-descriptor bits set")
    has_checksum = bool(desc & 0x80)
    nf = _u32(raw, n - 9)
    entry = 12 if has_checksum else 8
    payload = nf * entry + 9
    skip_off = n - payload - 8
    if skip_off < 0:
        raise ZstdError("seek table escapes the buffer")
    magic = _u32(raw, skip_off)
    if magic != (SKIP_MAGIC_LO | SEEK_NIBBLE):
        raise ZstdError("seek table is not a skippable frame")
    if _u32(raw, skip_off + 4) != payload:
        raise ZstdError("seek-table size disagrees with the footer")
    out: list[dict] = []
    c_off = d_off = 0
    i = skip_off + 8
    for fi in range(nf):
        c_size = _u32(raw, i)
        d_size = _u32(raw, i + 4)
        i += entry
        out.append(
            {
                "frame_idx": fi,
                "c_off": c_off,
                "c_size": c_size,
                "d_off": d_off,
                "d_size": d_size,
            }
        )
        c_off += c_size
        d_off += d_size
    if c_off != skip_off:
        raise ZstdError(
            "seek-table compressed sizes disagree with the body"
        )
    return out


def build_seekable(content: bytes, k: int) -> bytes:
    """``build_zstd_frames`` plus the seekable-format seek table —
    a valid seekable .zst (no per-frame checksums)."""
    body = build_zstd_frames(content, k)
    frames = zstd_frames(body)
    payload = bytearray()
    for f in frames:
        payload += struct.pack("<II", f["length"], f["content_size"])
    payload += struct.pack("<IBI", len(frames), 0, SEEKABLE_MAGIC)
    return (
        body
        + struct.pack("<I", SKIP_MAGIC_LO | SEEK_NIBBLE)
        + struct.pack("<I", len(payload))
        + bytes(payload)
    )
