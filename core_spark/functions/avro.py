"""Avro Object Container File (OCF) walking — the row-major
serialization format a large share of warehouse-exported training
data ships in (the public Apache Avro 1.11 spec). Pure stdlib.

An OCF is: the 4-byte magic ``Obj\\x01``; a file-metadata MAP
(avro.schema JSON, avro.codec) in Avro binary map encoding; a
16-byte sync marker; then data blocks, each ``<count long>
<byte-size long> <serialized records> <sync marker>``. Longs are
zigzag-encoded base-128 varints (the same wire varint as protobuf,
functions/protowire.py, with Avro's zigzag applied to every long);
strings are length-prefixed UTF-8. The ``deflate`` codec is raw
DEFLATE (RFC 1951, no zlib header) per the spec; ``snappy`` is one
raw snappy block (decoded by the repo's from-spec
functions/snappy.py, pinned against pyarrow's independent C
encoder) followed by a 4-byte BIG-endian CRC32 of the UNCOMPRESSED
block data, VERIFIED; ``null`` is uncompressed.

Value decode covers the full primitive set — null, boolean (one
byte, anything but 0/1 is corrupt), int and long (zigzag varints),
float and double (IEEE 754 little-endian), bytes and string
(length-prefixed) — plus unions (zigzag branch index then the
branch's value), which is how Avro spells nullable columns
(``["null", T]``), plus the common LOGICAL types (spec §Logical
Types): ``decimal`` over bytes (big-endian two's-complement
unscaled integer at the schema's scale → decimal.Decimal),
``date`` over int (days since epoch → datetime.date),
``timestamp-micros``/``timestamp-millis`` over long (→ naive-UTC
datetime), ``time-micros``/``time-millis`` (→ datetime.time) and
``uuid`` over string (the annotated string), written as
a dict field spec {"type": ..., "logicalType": ...}, plus ONE-level
ARRAYS of primitives or unions ({"type": "array", "items": ...} —
zigzag-count blocks concatenated until the zero terminator,
including the spec's skippable negative-count+byte-size form),
completing list support across all three row formats beside
parquet's and ORC's list readers — MAPS
({"type": "map", "values": ...}: the same block shape with a
length-prefixed UTF-8 key before each value) — and, as of r11,
NESTED complex types at any depth: records-in-records (decoded to
dicts, fields by dotted path via ``record_path``), arrays of
arrays/records, maps of maps — the recursion mirrors the parquet
(_assemble_records) and ORC (_stripe_value) nested tiers, pinned
against the JAVA Avro encoder (the avro-1.12 jar on Spark's own
classpath, driven through its JsonDecoder so the independent
library does all binary encoding), ENUMS (zigzag symbol index ->
the symbol string, out-of-range indices raise), and FIXED (exactly
``size`` raw bytes; decimal-over-fixed unscales like
decimal-over-bytes). r12 closed the remaining common logical types:
``local-timestamp-millis``/``local-timestamp-micros`` over long
(the zone-free wall-clock shape Java/Flink lake writers emit —
decoded with the same epoch arithmetic as timestamp-*, the
instant/wall distinction living in the schema), ``uuid`` over
fixed[16] (RFC 4122 big-endian bytes → the canonical hyphenated
string, same representation as uuid-over-string), and ``duration``
over fixed[12] (three little-endian uint32 → {months, days,
millis}, kept apart because calendar components don't
inter-convert) — each pinned against the Java Avro encoder. A
logical type outside this set still raises the named scope fence.

The block layout is what makes OCF object-storage friendly — the
same ranged-GET discipline as the media walks: a reader seeks by
sync marker, fetches whole blocks, and decodes records only inside
the blocks it needs. ``avro_blocks`` returns that fetch plan
(absolute data offsets); ``avro_block_records`` decodes one
fetched block.

Corrupt-input discipline (the codec-suite rule): a wrong magic,
a metadata map that escapes the buffer, a sync-marker mismatch, or
a varint running past EOF raises the named AvroError — never a
hang, never fabricated records.

Reference parity: gazette/core moves opaque serializations only
(message/interfaces.go:121-124); container parsing happens in
executor-side Arrow kernels.
"""

from __future__ import annotations

import datetime
import decimal
import uuid
import json
import struct
import zlib

MAGIC = b"Obj\x01"
MAX_VARINT_BYTES = 10
MAX_BLOCK_RECORDS = 1_000_000


class AvroError(ValueError):
    """Named parse failure: corrupt or non-Avro input."""


# ------------------------------------------------------------ primitives
def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63) if n < 0 else n << 1


def _unzigzag(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


def write_long(n: int) -> bytes:
    """Avro long: zigzag then base-128 little-endian varint."""
    u = _zigzag(n)
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def read_long(raw: bytes, i: int) -> tuple[int, int]:
    """→ (value, next index). Raises AvroError on truncation or an
    over-long varint (a crafted stream can't force a huge shift)."""
    u = shift = 0
    for k in range(MAX_VARINT_BYTES):
        if i + k >= len(raw):
            raise AvroError("varint runs past EOF")
        b = raw[i + k]
        u |= (b & 0x7F) << shift
        if not b & 0x80:
            return _unzigzag(u), i + k + 1
        shift += 7
    raise AvroError("varint longer than 10 bytes")


def write_string(s: str) -> bytes:
    b = s.encode("utf-8")
    return write_long(len(b)) + b


def read_string(raw: bytes, i: int) -> tuple[str, int]:
    n, i = read_long(raw, i)
    if n < 0 or i + n > len(raw):
        raise AvroError("string length escapes the buffer")
    try:
        return raw[i : i + n].decode("utf-8"), i + n
    except UnicodeDecodeError as e:
        raise AvroError(f"string is not UTF-8: {e}") from None


def read_bytes(raw: bytes, i: int) -> tuple[bytes, int]:
    n, i = read_long(raw, i)
    if n < 0 or i + n > len(raw):
        raise AvroError("bytes length escapes the buffer")
    return raw[i : i + n], i + n


# --------------------------------------------------------------- header
def _read_meta_map(raw: bytes, i: int) -> tuple[dict[str, bytes], int]:
    """Avro map<string, bytes>: blocks of (count, pairs...) until a
    zero count; a negative count is followed by a byte size (spec:
    skippable blocks) — we read the pairs either way."""
    meta: dict[str, bytes] = {}
    while True:
        count, i = read_long(raw, i)
        if count == 0:
            return meta, i
        if count < 0:
            count = -count
            _, i = read_long(raw, i)  # block byte size: unused here
        if count > MAX_BLOCK_RECORDS:
            raise AvroError("metadata map count is implausible")
        for _ in range(count):
            k, i = read_string(raw, i)
            v, i = read_bytes(raw, i)
            meta[k] = v


def avro_ocf_meta(raw: bytes) -> dict:
    """Header walk → {schema (parsed JSON), codec, sync (hex),
    data_start (absolute offset of the first block)}."""
    if raw[:4] != MAGIC:
        raise AvroError("bad OCF magic")
    meta, i = _read_meta_map(raw, 4)
    if "avro.schema" not in meta:
        raise AvroError("missing avro.schema")
    try:
        schema = json.loads(meta["avro.schema"])
    except ValueError:
        raise AvroError("avro.schema is not JSON") from None
    try:
        codec = meta.get("avro.codec", b"null").decode("ascii")
    except UnicodeDecodeError:
        raise AvroError("avro.codec is not ASCII") from None
    if codec not in ("null", "deflate", "snappy"):
        raise AvroError(f"unsupported codec {codec!r}")
    if i + 16 > len(raw):
        raise AvroError("truncated sync marker")
    sync = raw[i : i + 16]
    return {
        "schema": schema,
        "codec": codec,
        "sync": sync.hex(),
        "data_start": i + 16,
    }


def avro_blocks(raw: bytes) -> list[dict]:
    """Block walk → fetch plan: [{block_idx, n_records, data_off,
    data_len}] with ABSOLUTE offsets of each block's (possibly
    compressed) record bytes. Verifies every trailing sync marker."""
    hdr = avro_ocf_meta(raw)
    sync = bytes.fromhex(hdr["sync"])
    i, out = hdr["data_start"], []
    while i < len(raw):
        count, i = read_long(raw, i)
        if count <= 0 or count > MAX_BLOCK_RECORDS:
            raise AvroError("implausible block record count")
        size, i = read_long(raw, i)
        if size < 0 or i + size + 16 > len(raw):
            raise AvroError("block escapes the buffer")
        out.append(
            {
                "block_idx": len(out),
                "n_records": count,
                "data_off": i,
                "data_len": size,
            }
        )
        i += size
        if raw[i : i + 16] != sync:
            raise AvroError("sync marker mismatch")
        i += 16
    return out


_EPOCH_DATE = datetime.date(1970, 1, 1)
_EPOCH_DT = datetime.datetime(1970, 1, 1)


_PRIMITIVES = (
    "null", "boolean", "int", "long", "float", "double", "bytes",
    "string",
)


def collect_named_types(typ, registry: dict | None = None) -> dict:
    """Walk a schema collecting NAMED type definitions (record, enum,
    fixed) by name AND fullname — Avro schemas reference an
    already-defined type by its name string (e.g. a nullable enum is
    ``["null", "c"]`` after ``c`` is defined once), and the reader
    must resolve those references to decode."""
    if registry is None:
        registry = {}
    if isinstance(typ, list):
        for b in typ:
            collect_named_types(b, registry)
    elif isinstance(typ, dict):
        t = typ.get("type")
        if t in ("record", "enum", "fixed") and typ.get("name"):
            registry[typ["name"]] = typ
            ns = typ.get("namespace")
            if ns:
                registry[f"{ns}.{typ['name']}"] = typ
        if t == "record":
            for f in typ.get("fields", []):
                collect_named_types(f.get("type"), registry)
        elif t == "array":
            collect_named_types(typ.get("items"), registry)
        elif t == "map":
            collect_named_types(typ.get("values"), registry)
    return registry


def _read_value(data: bytes, i: int, typ, named: dict | None = None):
    """One Avro value of primitive, union, or logical type →
    (value, next i). ``typ`` is a type-name string, a union branch
    list, or a dict spec {"type": ..., "logicalType": ...};
    ``named`` resolves references to already-defined record/enum/
    fixed types by name (collect_named_types)."""
    if (
        isinstance(typ, str)
        and typ not in _PRIMITIVES
        and named
        and typ in named
    ):
        typ = named[typ]
    if isinstance(typ, dict) and typ.get("type") == "enum":
        # zigzag index into the declared symbol list; an index the
        # schema doesn't name is corrupt input, never a blank
        idx, i = read_long(data, i)
        symbols = typ.get("symbols") or []
        if not 0 <= idx < len(symbols):
            raise AvroError(
                f"enum index {idx} out of range for {len(symbols)} "
                "symbols"
            )
        return symbols[idx], i
    if isinstance(typ, dict) and typ.get("type") == "fixed":
        size = typ.get("size")
        if not isinstance(size, int) or size < 0:
            raise AvroError("fixed type lacks a valid size")
        if i + size > len(data):
            raise AvroError("fixed value escapes the buffer")
        v = data[i : i + size]
        lt = typ.get("logicalType")
        if lt == "decimal":
            unscaled = int.from_bytes(v, "big", signed=True)
            return decimal.Decimal(unscaled).scaleb(-typ["scale"]), i + size
        if lt == "uuid":
            # spec 1.11.1+: uuid may annotate fixed[16] — RFC 4122
            # big-endian bytes; decode to the canonical hyphenated
            # string, same representation as uuid-over-string
            if size != 16:
                raise AvroError("uuid over fixed requires size 16")
            return str(uuid.UUID(bytes=bytes(v))), i + size
        if lt == "duration":
            # spec: fixed[12] of three little-endian uint32 —
            # months, days, milliseconds (calendar components kept
            # apart because they don't inter-convert)
            if size != 12:
                raise AvroError("duration requires fixed size 12")
            months, days, millis = struct.unpack("<III", v)
            return {"months": months, "days": days, "millis": millis}, (
                i + size
            )
        return v, i + size
    if isinstance(typ, dict) and typ.get("type") == "record":
        # record-in-record (r11): fields decode in declaration order
        # into a dict — the parquet/ORC STRUCT twin; address nested
        # fields with record_path("a.b.c").
        rec: dict = {}
        for f in typ.get("fields", []):
            rec[f["name"]], i = _read_value(data, i, f["type"], named)
        return rec, i
    if isinstance(typ, dict) and typ.get("type") == "map":
        # Avro map: the array block shape with a length-prefixed
        # UTF-8 key before each value (the file-metadata map's
        # encoding, generalized to any value type), values at any
        # depth via recursion (r11).
        vtyp = typ.get("values")
        out_map: dict = {}
        while True:
            count, i = read_long(data, i)
            if count == 0:
                return out_map, i
            if count < 0:
                count = -count
                _, i = read_long(data, i)  # block byte size: unused
            if count > MAX_BLOCK_RECORDS:
                raise AvroError("map block count is implausible")
            for _ in range(count):
                k, i = read_string(data, i)
                out_map[k], i = _read_value(data, i, vtyp, named)
    if isinstance(typ, dict) and typ.get("type") == "array":
        # Avro array: blocks of (zigzag count, items...) until a zero
        # count; a negative count is followed by the block's byte
        # size (spec: skippable blocks) and |count| items — the same
        # shape as the file-metadata map. Items at any depth via
        # recursion (r11): arrays of arrays/records/maps decode.
        items = typ.get("items")
        out_arr: list = []
        while True:
            count, i = read_long(data, i)
            if count == 0:
                return out_arr, i
            if count < 0:
                count = -count
                _, i = read_long(data, i)  # block byte size: unused
            if count > MAX_BLOCK_RECORDS:
                raise AvroError("array block count is implausible")
            for _ in range(count):
                v, i = _read_value(data, i, items, named)
                out_arr.append(v)
    if isinstance(typ, dict):  # logical type over an underlying type
        lt = typ.get("logicalType")
        # fence BEFORE decoding: an unsupported shape must never
        # consume bytes as if it were understood
        if lt == "decimal" and typ["type"] != "bytes":
            raise AvroError(
                "decimal over this shape is not supported (bytes "
                "and fixed decode; anything else is corrupt or new)"
            )
        if lt == "date" and typ["type"] != "int":
            raise AvroError("date must annotate int")
        if lt == "timestamp-micros" and typ["type"] != "long":
            raise AvroError("timestamp-micros must annotate long")
        if lt == "timestamp-millis" and typ["type"] != "long":
            raise AvroError("timestamp-millis must annotate long")
        if lt == "time-micros" and typ["type"] != "long":
            raise AvroError("time-micros must annotate long")
        if lt == "time-millis" and typ["type"] != "int":
            raise AvroError("time-millis must annotate int")
        if lt == "uuid" and typ["type"] != "string":
            raise AvroError("uuid must annotate string")
        if (
            lt in ("local-timestamp-micros", "local-timestamp-millis")
            and typ["type"] != "long"
        ):
            raise AvroError(f"{lt} must annotate long")
        if lt not in (
            None, "decimal", "date", "timestamp-micros",
            "timestamp-millis", "time-micros", "time-millis", "uuid",
            "local-timestamp-micros", "local-timestamp-millis",
        ):
            raise AvroError(f"unsupported logical type {lt!r}")
        v, i = _read_value(data, i, typ["type"], named)
        if lt == "decimal":
            unscaled = int.from_bytes(v, "big", signed=True)
            return decimal.Decimal(unscaled).scaleb(-typ["scale"]), i
        if lt == "date":
            return _EPOCH_DATE + datetime.timedelta(days=v), i
        if lt in ("timestamp-micros", "local-timestamp-micros"):
            # both decode to a naive datetime from the epoch count;
            # the semantic difference (UTC instant vs. zone-free
            # wall-clock) lives in the schema, not the arithmetic
            return _EPOCH_DT + datetime.timedelta(microseconds=v), i
        if lt in ("timestamp-millis", "local-timestamp-millis"):
            return _EPOCH_DT + datetime.timedelta(milliseconds=v), i
        if lt == "time-micros":
            return datetime.time(
                v // 3_600_000_000,
                v // 60_000_000 % 60,
                v // 1_000_000 % 60,
                v % 1_000_000,
            ), i
        if lt == "time-millis":
            return datetime.time(
                v // 3_600_000,
                v // 60_000 % 60,
                v // 1_000 % 60,
                v % 1_000 * 1000,
            ), i
        # uuid: the annotated string IS the value
        return v, i
    if isinstance(typ, list):  # union: zigzag branch index, then value
        idx, i = read_long(data, i)
        if not 0 <= idx < len(typ):
            raise AvroError(f"union branch {idx} out of range")
        return _read_value(data, i, typ[idx], named)
    if typ in ("long", "int"):
        v, i = read_long(data, i)
        if typ == "int" and not -(1 << 31) <= v < 1 << 31:
            raise AvroError(f"int value {v} overflows 32 bits")
        return v, i
    if typ == "string":
        return read_string(data, i)
    if typ == "bytes":
        return read_bytes(data, i)
    if typ == "boolean":
        if i >= len(data):
            raise AvroError("boolean runs past EOF")
        b = data[i]
        if b > 1:
            raise AvroError(f"boolean byte {b:#04x} is neither 0 nor 1")
        return bool(b), i + 1
    if typ == "float":
        if i + 4 > len(data):
            raise AvroError("float runs past EOF")
        return struct.unpack_from("<f", data, i)[0], i + 4
    if typ == "double":
        if i + 8 > len(data):
            raise AvroError("double runs past EOF")
        return struct.unpack_from("<d", data, i)[0], i + 8
    if typ == "null":
        return None, i
    raise AvroError(f"unsupported field type {typ!r}")


def _decode_block_bytes(data: bytes, codec: str) -> bytes:
    """Inflate one block's bytes per avro.codec. The snappy codec's
    trailing big-endian CRC32 (of the UNCOMPRESSED data, per the
    spec) is verified, never skipped."""
    if codec == "deflate":
        try:
            return zlib.decompress(data, wbits=-15)  # raw DEFLATE
        except zlib.error as e:
            raise AvroError(f"deflate block: {e}") from None
    if codec == "snappy":
        from core_spark.functions.snappy import SnappyError, snappy_decompress

        if len(data) < 4:
            raise AvroError("snappy block too short for its CRC32")
        try:
            out = snappy_decompress(data[:-4])
        except SnappyError as e:
            raise AvroError(f"snappy block: {e}") from None
        (want,) = struct.unpack(">I", data[-4:])
        got = zlib.crc32(out)
        if want != got:
            raise AvroError(
                f"snappy block CRC32 mismatch "
                f"(want {want:#010x}, got {got:#010x})"
            )
        return out
    return data


def record_path(rec, path: str):
    """Dotted-path field access over decoded (possibly nested)
    records, with the same flattened-null convention as the parquet
    and ORC struct paths: None when the field OR any enclosing
    record is null; a missing field name raises the named error
    (silent None would hide a typo)."""
    cur = rec
    for part in path.split("."):
        if cur is None:
            return None
        if not isinstance(cur, dict):
            raise AvroError(
                f"path {path!r} descends into a non-record at {part!r}"
            )
        if part not in cur:
            raise AvroError(f"no field {part!r} under the record")
        cur = cur[part]
    return cur


def avro_block_records(
    data: bytes, codec: str, fields: list[tuple[str, object]], n: int,
    named: dict | None = None,
) -> list[dict]:
    """Decode one fetched block's record bytes: `fields` is the flat
    record layout [(name, type), ...] where type is a primitive name,
    a union list (e.g. ["null", "string"] — Avro's nullable), a
    nested record/array/map spec (r11 — decoded recursively), or a
    NAME referencing an earlier definition (resolve with ``named``
    from collect_named_types; built from `fields` when omitted)."""
    if named is None:
        named = collect_named_types([t for _n, t in fields])
    data = _decode_block_bytes(data, codec)
    i, out = 0, []
    for _ in range(n):
        rec = {}
        for name, typ in fields:
            rec[name], i = _read_value(data, i, typ, named)
        out.append(rec)
    if i != len(data):
        raise AvroError("trailing bytes after the declared records")
    return out


# -------------------------------------------------------------- builder
_FIELDS = [("seq", "long"), ("tag", "string"), ("score", "long")]
_SCHEMA = {
    "type": "record",
    "name": "doc_stat",
    "fields": [
        {"name": "seq", "type": "long"},
        {"name": "tag", "type": "string"},
        {"name": "score", "type": "long"},
    ],
}


_TYPED_FIELDS: list[tuple[str, object]] = [
    ("seq", "int"),
    ("flag", "boolean"),
    ("ratio", "double"),
    ("fval", "float"),
    ("note", ["null", "string"]),
    ("blob", "bytes"),
    ("dec", {"type": "bytes", "logicalType": "decimal",
             "precision": 12, "scale": 2}),
    ("day", {"type": "int", "logicalType": "date"}),
    ("ts", {"type": "long", "logicalType": "timestamp-micros"}),
]
_TYPED_SCHEMA = {
    "type": "record",
    "name": "doc_typed",
    "fields": [
        {"name": "seq", "type": "int"},
        {"name": "flag", "type": "boolean"},
        {"name": "ratio", "type": "double"},
        {"name": "fval", "type": "float"},
        {"name": "note", "type": ["null", "string"]},
        {"name": "blob", "type": "bytes"},
        {"name": "dec", "type": {"type": "bytes",
                                 "logicalType": "decimal",
                                 "precision": 12, "scale": 2}},
        {"name": "day", "type": {"type": "int", "logicalType": "date"}},
        {"name": "ts", "type": {"type": "long",
                                "logicalType": "timestamp-micros"}},
    ],
}


def _signed_be(n: int) -> bytes:
    """Minimal big-endian two's-complement — the decimal unscaled
    encoding (spec: 'two's-complement … big-endian byte order')."""
    return n.to_bytes(max(1, (n.bit_length() + 8) // 8), "big", signed=True)


def _write_bytes_v(b: bytes) -> bytes:
    return write_long(len(b)) + b


def build_avro_typed_fixture(digest: str) -> bytes:
    """Deterministic full-primitive OCF from an md5 digest: codec
    cycles null/deflate/snappy by digest[2] % 3 (the snappy path
    carries its spec-mandated big-endian CRC32 of the uncompressed
    block); ``2 + digest[0]%2`` blocks of ``2 + digest[1]%3``
    records. With base = digest[3:5] as int, record (b, i) carries
    seq = 100b + i (int), flag = (base+i) even (boolean),
    ratio = (8*base + 7i - 3b)/32 (double, exact in binary),
    fval = i - b (float, small ints exact), note = null when
    (b+i)%3 == 0 else "digest[:6]-b-i" (the ["null","string"]
    union — both branches exercised), blob = the digest's 16 bytes
    repeated 1 + i%2 times, dec = decimal(12,2) with unscaled
    13i - 3b + base - 200 (negatives exercise the two's-complement
    sign), day = epoch + (10*base + 31i + b) days,
    ts = ((base%50)*86400 + 3661i + b) seconds + i microseconds
    since epoch. The sync marker is the digest itself."""
    ci = int(digest[2], 16) % 3
    codec = ("null", "deflate", "snappy")[ci]
    nblocks = 2 + int(digest[0], 16) % 2
    nrec = 2 + int(digest[1], 16) % 3
    sync = bytes.fromhex(digest)
    meta = (
        write_long(2)
        + write_string("avro.schema")
        + _write_bytes_v(
            json.dumps(_TYPED_SCHEMA, separators=(",", ":")).encode()
        )
        + write_string("avro.codec")
        + _write_bytes_v(codec.encode())
        + write_long(0)
    )
    out = bytearray(MAGIC + meta + sync)
    base = int(digest[3:5], 16)
    for b in range(nblocks):
        body = bytearray()
        for i in range(nrec):
            body += write_long(100 * b + i)
            body += bytes([(base + i) % 2 == 0])
            body += struct.pack("<d", (8 * base + 7 * i - 3 * b) / 32.0)
            body += struct.pack("<f", float(i - b))
            if (b + i) % 3 == 0:
                body += write_long(0)  # union branch: null
            else:
                body += write_long(1) + write_string(
                    f"{digest[:6]}-{b}-{i}"
                )
            body += _write_bytes_v(sync * (1 + i % 2))
            body += _write_bytes_v(_signed_be(13 * i - 3 * b + base - 200))
            body += write_long(10 * base + 31 * i + b)
            body += write_long(
                ((base % 50) * 86400 + 3661 * i + b) * 1_000_000 + i
            )
        data = bytes(body)
        if codec == "deflate":
            co = zlib.compressobj(6, zlib.DEFLATED, -15)
            data = co.compress(data) + co.flush()
        elif codec == "snappy":
            import pyarrow as pa  # independent C encoder pins the decoder

            data = pa.Codec("snappy").compress(data, asbytes=True)
            data += struct.pack(">I", zlib.crc32(bytes(body)))
        out += write_long(nrec) + write_long(len(data)) + data + sync
    return bytes(out)


def build_avro_fixture(digest: str) -> bytes:
    """Deterministic OCF from an md5 digest: codec alternates
    null/deflate by digest[2] (both paths exercised corpus-wide),
    ``2 + digest[0]%2`` blocks of ``2 + digest[1]%3`` records; record
    (b, i) carries seq = 100b + i, tag = digest[:6]-b-i and a SIGNED
    score ``digest[3:5] - 128 + 7i - 3b`` (negatives exercise the
    zigzag sign path). The sync marker is the digest's own 16 bytes,
    so the walk's marker verification is exercised on every doc."""
    codec = "deflate" if int(digest[2], 16) % 2 else "null"
    nblocks = 2 + int(digest[0], 16) % 2
    nrec = 2 + int(digest[1], 16) % 3
    sync = bytes.fromhex(digest)
    meta = (
        write_long(2)
        + write_string("avro.schema")
        + (lambda b: write_long(len(b)) + b)(
            json.dumps(_SCHEMA, separators=(",", ":")).encode()
        )
        + write_string("avro.codec")
        + (lambda b: write_long(len(b)) + b)(codec.encode())
        + write_long(0)
    )
    out = bytearray(MAGIC + meta + sync)
    base = int(digest[3:5], 16) - 128
    for b in range(nblocks):
        body = bytearray()
        for i in range(nrec):
            body += write_long(100 * b + i)
            body += write_string(f"{digest[:6]}-{b}-{i}")
            body += write_long(base + 7 * i - 3 * b)
        data = bytes(body)
        if codec == "deflate":
            co = zlib.compressobj(6, zlib.DEFLATED, -15)
            data = co.compress(data) + co.flush()
        out += write_long(nrec) + write_long(len(data)) + data + sync
    return bytes(out)
