"""Compiled protobuf descriptors → protowire field specs.

The reference frames protobuf messages whose shape ships as compiled
descriptors (generated `.pb.go` beside `message/fixed_framing.go:32-148`;
the word-count NGramCount message in
examples/word-count/word_count.pb.go:32-39). A cluster deployment
compiles `.proto` files with protoc into a `FileDescriptorSet` blob —
this module accepts that blob directly, with no protobuf runtime:
descriptor.proto is itself a protobuf message with a public, frozen
wire layout, so the same pure-Python varint walker that decodes
message bodies (functions/protowire.py) decodes the descriptors too.

`descriptor_set_to_spec(fds_bytes, "pkg.Message")` returns the
{field_no: (name, kind)} spec the framing/decode layer already
consumes — the schema DSL and compiled descriptors are two front-ends
to one decoder.

Supported field types (the set the wire decoder speaks): double,
float, every varint class incl. sint32/64 (zigzag), fixed32/64 +
signed, string, bytes, nested messages, repeated varint/zigzag
fields (packed or not), repeated string/bytes (array<string>/
array<binary>), repeated float/double (array<float>/array<double> —
the proto embedding-vector shape), and repeated messages
(array<struct<...>>) — which makes proto map<k,v> fields work
as-is, since protoc compiles them to repeated MapEntry{key=1,
value=2} nested messages. Groups, repeated fixed-width int fields,
scalar unsigned fixed64, and recursive message types raise
NotImplementedError by name — decode would be silently wrong
otherwise.
"""

from __future__ import annotations

# FieldDescriptorProto.Type enum values (descriptor.proto, frozen).
_T_DOUBLE, _T_FLOAT = 1, 2
_T_INT64, _T_UINT64, _T_INT32 = 3, 4, 5
_T_FIXED64, _T_FIXED32 = 6, 7
_T_BOOL, _T_STRING, _T_GROUP, _T_MESSAGE, _T_BYTES = 8, 9, 10, 11, 12
_T_UINT32, _T_ENUM = 13, 14
_T_SFIXED32, _T_SFIXED64, _T_SINT32, _T_SINT64 = 15, 16, 17, 18

_VARINT_TYPES = {_T_INT64, _T_UINT64, _T_INT32, _T_UINT32, _T_BOOL, _T_ENUM}
_LABEL_REPEATED = 3

# Signedness matters: negative int32/int64/enum values wire-encode as
# sign-extended 64-bit varints (varint2c folds them back); fixed32 is
# unsigned in proto (ufixed32) while sfixed32 is signed; sfixed64 fits
# long. Unsigned 64-bit types cannot be represented in a long column
# for values ≥ 2^63 — uint64 varints keep the raw interpretation (the
# standard proto→int64 hazard, same as any int64-typed consumer) but
# unsigned *fixed64* raises below rather than silently reading '<q'.
_SCALAR_KIND = {
    _T_DOUBLE: "double",
    _T_FLOAT: "float",
    _T_SFIXED64: "fixed64",
    _T_FIXED32: "ufixed32",
    _T_SFIXED32: "fixed32",
    _T_STRING: "str",
    _T_BYTES: "bytes",
    _T_UINT64: "varint",
    _T_UINT32: "varint",
    _T_BOOL: "varint",
    _T_INT64: "varint2c",
    _T_INT32: "varint2c",
    _T_ENUM: "varint2c",
}


def _varint(b: bytes, i: int) -> tuple[int, int]:
    shift = val = 0
    while True:
        if i >= len(b):
            raise ValueError(
                f"truncated descriptor: varint runs past end at byte {i}"
            )
        byte = b[i]
        i += 1
        val |= (byte & 0x7F) << shift
        if not byte & 0x80:
            return val, i
        shift += 7


def _take(raw: bytes, i: int, n: int, no: int) -> tuple[bytes, int]:
    """Slice n bytes with a bounds check — a short slice would
    otherwise silently mis-decode wire types 1/2/5 downstream."""
    if i + n > len(raw):
        raise ValueError(
            f"truncated descriptor: field {no} needs {n} bytes at "
            f"offset {i}, only {len(raw) - i} remain"
        )
    return raw[i : i + n], i + n


def _fields(raw: bytes) -> dict[int, list]:
    """Generic protobuf walk: field_no → list of raw values in wire
    order (repeated fields keep every occurrence). Raises ValueError
    naming the field/offset on truncated or corrupt input rather than
    an executor-opaque IndexError or a silent short slice."""
    i, out = 0, {}
    while i < len(raw):
        tag, i = _varint(raw, i)
        no, wire = tag >> 3, tag & 0x7
        if wire == 0:
            v, i = _varint(raw, i)
        elif wire == 1:
            v, i = _take(raw, i, 8, no)
        elif wire == 2:
            ln, i = _varint(raw, i)
            v, i = _take(raw, i, ln, no)
        elif wire == 5:
            v, i = _take(raw, i, 4, no)
        else:
            raise ValueError(f"unsupported wire type {wire} in descriptor")
        out.setdefault(no, []).append(v)
    return out


def _index_messages(msg_raw: bytes, prefix: str, into: dict) -> None:
    """Register a DescriptorProto and its nested types by
    fully-qualified '.pkg.Outer.Inner' name."""
    mf = _fields(msg_raw)
    name = mf[1][0].decode()  # DescriptorProto.name = 1
    fq = f"{prefix}.{name}"
    into[fq] = msg_raw
    for nested in mf.get(3, []):  # nested_type = 3
        _index_messages(nested, fq, into)


def _to_spec(msg_raw: bytes, msgs: dict, seen: tuple) -> dict:
    spec: dict = {}
    for fd_raw in _fields(msg_raw).get(2, []):  # DescriptorProto.field = 2
        f = _fields(fd_raw)
        name = f[1][0].decode()  # FieldDescriptorProto.name = 1
        number = f[3][0]  # number = 3
        label = f.get(4, [1])[0]  # label = 4
        ftype = f[5][0]  # type = 5
        if ftype == _T_MESSAGE:
            type_name = f[6][0].decode()  # type_name = 6 (".pkg.Msg")
            if type_name in seen:
                raise NotImplementedError(
                    f"recursive message type {type_name} is not decodable "
                    "into a flat struct schema"
                )
            sub = _to_spec(msgs[type_name], msgs, seen + (type_name,))
            # repeated message -> array<struct>; maps arrive here too
            # (protoc compiles map<k,v> to repeated MapEntry)
            spec[number] = (
                name, [sub] if label == _LABEL_REPEATED else sub
            )
        elif ftype in (_T_SINT32, _T_SINT64):
            spec[number] = (
                name,
                "packed_zigzag" if label == _LABEL_REPEATED else "zigzag",
            )
        elif ftype == _T_FIXED64:
            raise NotImplementedError(
                f"field {name!r}: unsigned fixed64 values ≥ 2^63 cannot "
                "be represented in a long column (sfixed64 is supported)"
            )
        elif ftype == _T_GROUP:
            raise NotImplementedError(f"field {name!r}: proto2 groups")
        elif label == _LABEL_REPEATED:
            if ftype == _T_STRING:
                spec[number] = (name, "rep_str")
            elif ftype == _T_BYTES:
                spec[number] = (name, "rep_bytes")
            elif ftype == _T_FLOAT:
                spec[number] = (name, "packed_float")
            elif ftype == _T_DOUBLE:
                spec[number] = (name, "packed_double")
            elif ftype not in _VARINT_TYPES:
                raise NotImplementedError(
                    f"repeated field {name!r} of non-varint type {ftype}"
                )
            else:
                signed = ftype in (_T_INT32, _T_INT64, _T_ENUM)
                spec[number] = (
                    name,
                    "packed_varint2c" if signed else "packed_varint",
                )
        else:
            spec[number] = (name, _SCALAR_KIND[ftype])
    return spec


def descriptor_set_to_spec(fds_bytes: bytes, message_name: str) -> dict:
    """Resolve `message_name` (e.g. "examples.word_count.NGramCount",
    leading dot optional) inside a serialized FileDescriptorSet and
    return its {field_no: (name, kind)} protowire spec."""
    msgs: dict = {}
    for file_raw in _fields(fds_bytes).get(1, []):  # FileDescriptorSet.file
        ff = _fields(file_raw)
        pkg = ff.get(2, [b""])[0].decode()  # FileDescriptorProto.package
        prefix = f".{pkg}" if pkg else ""
        for msg_raw in ff.get(4, []):  # message_type = 4
            _index_messages(msg_raw, prefix, msgs)
    fq = message_name if message_name.startswith(".") else f".{message_name}"
    if fq not in msgs:
        known = ", ".join(sorted(msgs)) or "<none>"
        raise KeyError(f"message {fq} not in descriptor set (has: {known})")
    return _to_spec(msgs[fq], msgs, (fq,))
