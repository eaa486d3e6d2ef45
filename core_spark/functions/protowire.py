"""Protobuf wire-format decode — no protobuf runtime needed.

The reference's example messages are protobuf
(examples/word-count/word_count.pb.go:32-39: NGramCount{uuid: bytes=1,
n_gram: string=2, count: uint64=3}) carried in fixed-header frames
(message/fixed_framing.go:32-148). A schema-compiled runtime would
normally decode the body; none exists in this container, but the wire
format itself is simple — (tag varint, value) pairs — so schema-known
messages decode in an Arrow-batched `mapInPandas` stage with a pure-
Python varint reader. The decoder closure is self-contained (pickled
by value — worker processes need no repo import).

Field kinds (proto wire types in parens):
- 'varint' (0)        → long (unsigned interpretation)
- 'varint2c' (0)      → long, two's-complement signed — negative
  int32/int64/enum values wire-encode as 10-byte sign-extended
  varints; this kind folds them back (v - 2^64 when v ≥ 2^63)
- 'bytes' / 'str' (2) → binary / string
- 'double' (1), 'float' (5), 'fixed64' (1, signed), 'fixed32'
  (5, signed), 'ufixed32' (5, unsigned)
- 'packed_varint' / 'packed_varint2c' (2, or repeated 0) → array<long>
- 'zigzag' (0) → long (sint32/sint64: (v >> 1) ^ -(v & 1))
- 'packed_zigzag' (2, or repeated 0) → array<long>
- 'rep_str' / 'rep_bytes' (repeated 2) → array<string> / array<binary>
- a nested {field_no: (name, kind)} dict (2) → struct<...>, recursive
- a ONE-ELEMENT LIST [subspec] (repeated 2) → array<struct<...>> —
  repeated messages; proto map<k,v> fields compile to exactly this
  (repeated MapEntry{key=1, value=2}), so maps decode as
  array<struct<key, value>> with no special casing

Unknown fields are skipped per proto semantics (including wire types
1/5, whose width is known without a schema).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_KIND_DDL = {
    "varint": "long",
    "varint2c": "long",
    "bytes": "binary",
    "str": "string",
    "double": "double",
    "float": "float",
    "fixed64": "long",
    "fixed32": "long",
    "ufixed32": "long",
    "packed_varint": "array<bigint>",
    "packed_varint2c": "array<bigint>",
    "zigzag": "long",
    "packed_zigzag": "array<bigint>",
    "rep_str": "array<string>",
    "rep_bytes": "array<binary>",
    # repeated float/double — the proto embedding-vector shape
    # (packed wire-2 by default; unpacked 5/1 occurrences accepted)
    "packed_float": "array<float>",
    "packed_double": "array<double>",
}

# kinds whose column is an array (absent field -> [] not null);
# decode_proto captures this into its worker closure by value
_LIST_KINDS = (
    "packed_varint", "packed_varint2c", "packed_zigzag",
    "rep_str", "rep_bytes", "packed_float", "packed_double",
)


def schema_of(spec: dict) -> str:
    """DDL schema for a {field_no: (name, kind)} spec (kind may be a
    nested spec dict, or [subspec] for repeated messages)."""
    parts = []
    for name, kind in spec.values():
        if isinstance(kind, dict):
            parts.append(f"{name} struct<{schema_of(kind)}>")
        elif isinstance(kind, list):
            parts.append(f"{name} array<struct<{schema_of(kind[0])}>>")
        else:
            parts.append(f"{name} {_KIND_DDL[kind]}")
    return ", ".join(parts)


def decode_proto(
    df: DataFrame,
    payload_col: str,
    fields: dict,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Decode protobuf payloads per a {field_no: (name, kind)} spec.
    Output: one column per field (missing fields → null), plus
    `keep_cols` passed through unchanged."""
    spec = dict(fields)  # capture a plain dict in the closure
    list_kinds = _LIST_KINDS  # captured by VALUE: workers need no import
    keep = list(keep_cols or [])
    out_schema = schema_of(spec)
    if keep:
        kept_ddl = ", ".join(
            f"{f.name} {f.dataType.simpleString()}"
            for f in df.select(*keep).schema.fields
        )
        out_schema = f"{kept_ddl}, {out_schema}"

    def decode(batches):
        import struct as _struct

        import pandas as pd

        def read_varint(b: bytes, i: int) -> tuple[int, int]:
            shift = val = 0
            while True:
                byte = b[i]
                i += 1
                val |= (byte & 0x7F) << shift
                if not byte & 0x80:
                    return val, i
                shift += 7

        def decode_one(raw: bytes, sp: dict) -> dict:
            out = {}
            for name, kind in sp.values():
                out[name] = (
                    []
                    if kind in list_kinds or isinstance(kind, list)
                    else None
                )
            i = 0
            while i < len(raw):
                tag, i = read_varint(raw, i)
                field_no, wire = tag >> 3, tag & 0x7
                if wire == 0:
                    val, i = read_varint(raw, i)
                elif wire == 1:
                    val = raw[i : i + 8]
                    i += 8
                elif wire == 2:
                    ln, i = read_varint(raw, i)
                    val = raw[i : i + ln]
                    i += ln
                elif wire == 5:
                    val = raw[i : i + 4]
                    i += 4
                else:
                    raise ValueError(f"unsupported wire type {wire}")
                if field_no not in sp:
                    continue  # unknown field: skipped, width consumed
                name, kind = sp[field_no]
                # fixed-wire kinds must arrive on their wire type: a
                # corrupt tag pairing a length-delimited kind with
                # wire 0 would otherwise hit bytes(varint_int) —
                # fabricated NUL data for a small varint, a giant
                # allocation for a large one — and a fixed-width kind
                # would unpack a mis-sized buffer
                if isinstance(kind, (dict, list)):
                    allowed = (2,)
                else:
                    allowed = {
                        "str": (2,), "bytes": (2,), "rep_str": (2,),
                        "rep_bytes": (2,), "double": (1,), "fixed64": (1,),
                        "float": (5,), "fixed32": (5,), "ufixed32": (5,),
                        "varint": (0,), "varint2c": (0,), "zigzag": (0,),
                        # packed repeats also accept one unpacked
                        # occurrence on the scalar's own wire type
                        "packed_varint": (0, 2), "packed_varint2c": (0, 2),
                        "packed_zigzag": (0, 2),
                        "packed_float": (2, 5), "packed_double": (2, 1),
                    }.get(kind)
                if allowed is not None and wire not in allowed:
                    raise ValueError(
                        f"field {name!r}: kind accepts wire type(s) "
                        f"{allowed}, payload has {wire}"
                    )
                if isinstance(kind, dict):
                    out[name] = decode_one(bytes(val), kind)
                elif isinstance(kind, list):  # repeated message / map
                    out[name].append(decode_one(bytes(val), kind[0]))
                elif kind in (
                    "packed_varint", "packed_varint2c", "packed_zigzag"
                ):
                    def _fold(v, _k=kind):
                        if _k == "packed_zigzag":
                            return (v >> 1) ^ -(v & 1)
                        if _k == "packed_varint2c" and v >= 1 << 63:
                            return v - (1 << 64)
                        return v

                    if wire == 0:  # unpacked repeated occurrence
                        out[name].append(_fold(val))
                    else:
                        j = 0
                        while j < len(val):
                            v, j = read_varint(val, j)
                            out[name].append(_fold(v))
                elif kind == "rep_str":
                    out[name].append(bytes(val).decode("utf-8"))
                elif kind == "rep_bytes":
                    out[name].append(bytes(val))
                elif kind in ("packed_float", "packed_double"):
                    fmt, width = (
                        ("<f", 4) if kind == "packed_float" else ("<d", 8)
                    )
                    if wire == 2:  # packed: len/width elements
                        out[name].extend(
                            v[0]
                            for v in _struct.iter_unpack(fmt, bytes(val))
                        )
                    else:  # unpacked wire 5/1 occurrence
                        out[name].append(_struct.unpack(fmt, val)[0])
                elif kind == "zigzag":
                    out[name] = (val >> 1) ^ -(val & 1)
                elif kind == "str":
                    out[name] = bytes(val).decode("utf-8")
                elif kind == "double":
                    out[name] = _struct.unpack("<d", val)[0]
                elif kind == "float":
                    out[name] = _struct.unpack("<f", val)[0]
                elif kind == "fixed64":
                    out[name] = _struct.unpack("<q", val)[0]
                elif kind == "fixed32":
                    out[name] = _struct.unpack("<i", val)[0]
                elif kind == "ufixed32":
                    out[name] = _struct.unpack("<I", val)[0]
                elif kind == "varint2c":
                    out[name] = val - (1 << 64) if val >= 1 << 63 else val
                else:  # varint / bytes
                    out[name] = val
            return out

        for pdf in batches:
            decoded = pd.DataFrame(
                [decode_one(bytes(b), spec) for b in pdf[payload_col]]
            )
            if keep:
                base = pdf[keep].reset_index(drop=True)
                decoded = pd.concat([base, decoded], axis=1)
            yield decoded

    cols = [*keep, payload_col] if keep else [payload_col]
    return df.select(*cols).mapInPandas(decode, schema=out_schema)


# ------------------------------------------------------------- encoders
def encode_varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        out.append(b | (0x80 if n else 0))
        if not n:
            return bytes(out)


def encode_message(values: dict, spec: dict) -> bytes:
    """Encode {name: value} per the same spec (test/fixture side).
    Nested dicts recurse; packed_varint lists pack into one wire-2
    field."""
    by_name = {name: (no, kind) for no, (name, kind) in spec.items()}
    body = b""
    for name, value in values.items():
        no, kind = by_name[name]
        if value is None:
            continue
        if isinstance(kind, dict):
            sub = encode_message(value, kind)
            body += encode_varint(no << 3 | 2) + encode_varint(len(sub)) + sub
        elif isinstance(kind, list):  # repeated message / map entries
            for item in value:
                sub = encode_message(item, kind[0])
                body += (
                    encode_varint(no << 3 | 2)
                    + encode_varint(len(sub))
                    + sub
                )
        elif kind in ("packed_varint", "packed_varint2c"):
            packed = b"".join(
                encode_varint(v & ((1 << 64) - 1)) for v in value
            )
            body += encode_varint(no << 3 | 2) + encode_varint(len(packed)) + packed
        elif kind == "zigzag":
            body += encode_varint(no << 3 | 0) + encode_varint(
                (value << 1) ^ (value >> 63)
            )
        elif kind == "packed_zigzag":
            packed = b"".join(
                encode_varint((v << 1) ^ (v >> 63)) for v in value
            )
            body += (
                encode_varint(no << 3 | 2)
                + encode_varint(len(packed))
                + packed
            )
        elif kind in ("packed_float", "packed_double"):
            import struct as _s

            fmt = "<f" if kind == "packed_float" else "<d"
            packed = b"".join(_s.pack(fmt, v) for v in value)
            body += (
                encode_varint(no << 3 | 2)
                + encode_varint(len(packed))
                + packed
            )
        elif kind == "rep_str":
            for s in value:
                raw = s.encode("utf-8")
                body += (
                    encode_varint(no << 3 | 2)
                    + encode_varint(len(raw))
                    + raw
                )
        elif kind == "rep_bytes":
            for raw in value:
                body += (
                    encode_varint(no << 3 | 2)
                    + encode_varint(len(raw))
                    + raw
                )
        elif kind == "str":
            raw = value.encode("utf-8")
            body += encode_varint(no << 3 | 2) + encode_varint(len(raw)) + raw
        elif kind == "bytes":
            body += encode_varint(no << 3 | 2) + encode_varint(len(value)) + value
        elif kind == "varint":
            body += encode_varint(no << 3 | 0) + encode_varint(value)
        elif kind == "varint2c":
            body += encode_varint(no << 3 | 0) + encode_varint(
                value & ((1 << 64) - 1)
            )
        elif kind == "ufixed32":
            import struct as _s

            body += encode_varint(no << 3 | 5) + _s.pack("<I", value)
        else:
            raise ValueError(f"encode_message: unsupported kind {kind!r}")
    return body


def encode_ngram_count(uuid: bytes, ngram: str, count: int) -> bytes:
    """Test-side encoder for NGramCount (tag = field_no<<3 | wire)."""
    return encode_message(
        {"uuid": uuid, "ngram": ngram, "count": count},
        {1: ("uuid", "bytes"), 2: ("ngram", "str"), 3: ("count", "varint")},
    )
