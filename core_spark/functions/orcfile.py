"""ORC tail walking WITHOUT an ORC library — the fetch-planning
sibling of the parquet footer walk (functions/parquetfile.py) for
the OTHER columnar format journals write (sources/journal.py
supports per-fragment ORC): parse the postscript + footer from the
last bytes of the file, get stripe boundaries (the split/ranged-GET
unit), row counts, column types and integer min/max statistics —
no JVM and no pyarrow on the planning path.

Layout per the public Apache ORC specification: the file ends
``<footer> <postscript> <1-byte postscript length>`` with the
postscript carrying the magic "ORC", the compression kind, and the
footer's byte length. Both metadata sections are protobuf messages
(orc_proto.proto) on the standard protobuf wire (the same varint
encoding functions/protowire.py implements for message framing):
field headers ``(id << 3) | wiretype``, varints, length-delimited
submessages; IntegerStatistics min/max are ``sint64`` (zigzag).

Compression: the postscript is ALWAYS uncompressed; the footer is
compressed when the postscript says so, as a sequence of blocks
each headed by 3 LE bytes ``(length << 1) | is_original``. NONE,
ZLIB (raw DEFLATE, stdlib), SNAPPY, LZ4 and ZSTD (from-spec
decoders, functions/snappy.py, lz4.py and zstd_decode.py, each
pinned against pyarrow's codec) are fully supported — every codec
an ORC writer defaults to in practice now deframes with no format
library; only LZO still raises the named error.

Corrupt-input discipline: missing magic, a postscript or footer
escaping the buffer, an unknown wire type, or a varint running past
EOF raises the named OrcError — never a hang, never fabricated
plans. Unknown protobuf fields are SKIPPED (protobuf's
forward-compat contract, like the thrift walk's unknown-field
rule).
"""

from __future__ import annotations

import struct
import zlib

from core_spark.functions.lz4 import Lz4Error, lz4_block_decompress
from core_spark.functions.snappy import SnappyError, snappy_decompress
from core_spark.functions.zstd_decode import ZstdDecodeError, zstd_decompress

MAGIC = b"ORC"
MAX_VARINT_BYTES = 10
MAX_REPEATED = 1_000_000

_COMPRESSION = {
    0: "none", 1: "zlib", 2: "snappy", 3: "lzo", 4: "lz4", 5: "zstd",
}


class OrcError(ValueError):
    """Named parse failure: corrupt or non-ORC input."""


# ------------------------------------------------------- protobuf wire
def _varint(raw: bytes, i: int) -> tuple[int, int]:
    u = shift = 0
    for k in range(MAX_VARINT_BYTES):
        if i + k >= len(raw):
            raise OrcError("varint runs past EOF")
        b = raw[i + k]
        u |= (b & 0x7F) << shift
        if not b & 0x80:
            return u, i + k + 1
        shift += 7
    raise OrcError("varint longer than 10 bytes")


def _unzigzag(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


def _fields(raw: bytes):
    """Iterate (field id, wiretype, value) over one protobuf
    message; length-delimited values come back as bytes, varints as
    ints; fixed32/64 as ints. Unknown wire types raise."""
    i, n = 0, len(raw)
    count = 0
    while i < n:
        hdr, i = _varint(raw, i)
        fid, wt = hdr >> 3, hdr & 7
        if fid == 0:
            raise OrcError("field id 0 is invalid protobuf")
        if wt == 0:
            v, i = _varint(raw, i)
        elif wt == 1:
            if i + 8 > n:
                raise OrcError("fixed64 escapes the message")
            v = struct.unpack_from("<Q", raw, i)[0]
            i += 8
        elif wt == 2:
            ln, i = _varint(raw, i)
            if ln < 0 or i + ln > n:
                raise OrcError("length-delimited field escapes")
            v = raw[i : i + ln]
            i += ln
        elif wt == 5:
            if i + 4 > n:
                raise OrcError("fixed32 escapes the message")
            v = struct.unpack_from("<I", raw, i)[0]
            i += 4
        else:
            raise OrcError(f"unknown protobuf wire type {wt}")
        count += 1
        if count > MAX_REPEATED:
            raise OrcError("implausible field count")
        yield fid, wt, v


# --------------------------------------------------------- decompression
def _deframe(raw: bytes, kind: str) -> bytes:
    """Undo ORC's generic compression framing: 3-byte LE block
    headers ``(length << 1) | is_original``; ZLIB blocks are raw
    DEFLATE."""
    if kind == "none":
        return raw
    if kind not in ("zlib", "snappy", "lz4", "zstd"):
        raise OrcError(
            f"compression kind {kind!r} needs the {kind} codec "
            "library — install it or rewrite the fragment with "
            "zstd/zlib/snappy/lz4/none"
        )
    out = bytearray()
    i, n = 0, len(raw)
    while i < n:
        if i + 3 > n:
            raise OrcError("truncated compression block header")
        hdr = raw[i] | (raw[i + 1] << 8) | (raw[i + 2] << 16)
        length, original = hdr >> 1, hdr & 1
        i += 3
        if i + length > n:
            raise OrcError("compression block escapes the buffer")
        block = raw[i : i + length]
        i += length
        if original:
            out += block
        elif kind == "zstd":
            try:
                out += zstd_decompress(block)
            except ZstdDecodeError as e:
                raise OrcError(f"zstd block: {e}") from None
        elif kind == "lz4":
            try:
                out += lz4_block_decompress(block)
            except Lz4Error as e:
                raise OrcError(f"lz4 block: {e}") from None
        elif kind == "snappy":
            try:
                out += snappy_decompress(block)
            except SnappyError as e:
                raise OrcError(f"snappy block: {e}") from None
        else:
            try:
                out += zlib.decompress(block, wbits=-15)
            except zlib.error as e:
                raise OrcError(f"zlib block: {e}") from None
    return bytes(out)


# ------------------------------------------------------------- messages
def _parse_postscript(raw: bytes) -> dict:
    out = {"footer_len": None, "compression": "none", "magic": None}
    for fid, wt, v in _fields(raw):
        if fid == 1 and wt == 0:
            out["footer_len"] = v
        elif fid == 2 and wt == 0:
            out["compression"] = _COMPRESSION.get(v, f"unknown({v})")
        elif fid == 8000 and wt == 2:
            out["magic"] = v
    if out["magic"] != MAGIC:
        raise OrcError("postscript magic is not 'ORC'")
    if out["footer_len"] is None:
        raise OrcError("postscript missing footerLength")
    return out


def _parse_stripe(raw: bytes) -> dict:
    out = {}
    names = {1: "offset", 2: "index_len", 3: "data_len",
             4: "footer_len", 5: "n_rows"}
    for fid, wt, v in _fields(raw):
        if fid in names and wt == 0:
            out[names[fid]] = v
    return out


def _parse_int_stats(raw: bytes) -> dict:
    out = {}
    for fid, wt, v in _fields(raw):
        if fid == 1 and wt == 0:
            out["min"] = _unzigzag(v)
        elif fid == 2 and wt == 0:
            out["max"] = _unzigzag(v)
        elif fid == 3 and wt == 0:
            out["sum"] = _unzigzag(v)
    return out


def _parse_col_stats(raw: bytes) -> dict:
    out = {"n_values": None, "int": None}
    for fid, wt, v in _fields(raw):
        if fid == 1 and wt == 0:
            out["n_values"] = v
        elif fid == 2 and wt == 2:
            out["int"] = _parse_int_stats(v)
    return out


_TYPE_KINDS = {
    0: "boolean", 1: "byte", 2: "short", 3: "int", 4: "long",
    5: "float", 6: "double", 7: "string", 8: "binary", 9: "timestamp",
    10: "list", 11: "map", 12: "struct", 13: "union", 14: "decimal",
    15: "date", 16: "varchar", 17: "char",
}


def _parse_type(raw: bytes) -> dict:
    out = {"kind": None, "field_names": []}
    for fid, wt, v in _fields(raw):
        if fid == 1 and wt == 0:
            out["kind"] = _TYPE_KINDS.get(v, f"unknown({v})")
        elif fid == 3 and wt == 2:
            out["field_names"].append(v.decode("utf-8", "replace"))
    return out


def parse_orc_tail(raw: bytes) -> dict:
    """Whole-file bytes → {compression, n_rows, stripes: [{offset,
    index_len, data_len, footer_len, n_rows}], types (flat kinds,
    root first with its field names), stats: [{n_values,
    int {min,max,sum}}]} — the split/prune plan for an ORC file,
    from its tail bytes only."""
    if len(raw) < 4 or raw[:3] != MAGIC:
        raise OrcError("missing ORC header magic")
    ps_len = raw[-1]
    if ps_len + 1 > len(raw):
        raise OrcError("postscript length escapes the file")
    ps = _parse_postscript(raw[len(raw) - 1 - ps_len : len(raw) - 1])
    flen = ps["footer_len"]
    foot_end = len(raw) - 1 - ps_len
    if flen > foot_end:
        raise OrcError("footer length escapes the file")
    footer = _deframe(raw[foot_end - flen : foot_end], ps["compression"])
    out = {
        "compression": ps["compression"],
        "n_rows": None,
        "stripes": [],
        "types": [],
        "stats": [],
    }
    for fid, wt, v in _fields(footer):
        if fid == 3 and wt == 2:
            out["stripes"].append(_parse_stripe(v))
        elif fid == 4 and wt == 2:
            out["types"].append(_parse_type(v))
        elif fid == 6 and wt == 0:
            out["n_rows"] = v
        elif fid == 7 and wt == 2:
            out["stats"].append(_parse_col_stats(v))
    return out
