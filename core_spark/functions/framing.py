"""Framing registry: content-type → record decode/encode.

Reference: message/interfaces.go:82-96,179-196 — a journal's
`content-type` label selects a registered Framing; the registry
(message/routines.go:19-33) ships JSON-lines (json_framing.go:10-49),
CSV (csv_framing.go:15-81), and fixed-header protobuf
(fixed_framing.go:32-148: magic 0x66,0x33,0x93,0x36 + little-endian
u32 length + body).

Here a framing is a function (DataFrame, payload column, schema) →
DataFrame of decoded columns, built from Spark's native decoders
(`from_json` / `from_csv` — JVM, codegen'd). The fixed framing parses
the magic + LE length header with pure binary expressions and decodes
the protobuf body runtime-free via the protowire reader
(functions/protowire.py — varints, strings/bytes, fixed 32/64,
nested messages, packed repeated fields), against a field DSL that
stands in for a compiled descriptor.

`decode_journal` dispatches on a JournalSpec's content-type label —
the NewMessageFunc analog (message/interfaces.go:239-243).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

FIXED_MAGIC = bytes([0x66, 0x33, 0x93, 0x36])

Framing = Callable[[DataFrame, str, str], DataFrame]
_REGISTRY: dict[str, Framing] = {}


def register_framing(content_type: str, framing: Framing) -> None:
    """RegisterFraming (message/routines.go:19-33)."""
    _REGISTRY[content_type] = framing


def framing_for(content_type: str) -> Framing:
    try:
        return _REGISTRY[content_type]
    except KeyError:
        raise ValueError(f"no framing registered for {content_type!r}") from None


# ------------------------------------------------------------------- JSON
def json_framing(df: DataFrame, payload_col: str, schema: str) -> DataFrame:
    """application/x-ndjson: one JSON document per record."""
    return df.withColumn(
        "_msg", F.from_json(F.decode(F.col(payload_col), "UTF-8"), schema)
    )


# -------------------------------------------------------------------- CSV
def csv_framing(df: DataFrame, payload_col: str, schema: str) -> DataFrame:
    """text/csv: one CSV record per line (csv_framing.go:15-81)."""
    return df.withColumn(
        "_msg", F.from_csv(F.decode(F.col(payload_col), "UTF-8"), F.lit(schema))
    )


# ------------------------------------------------------------ fixed/proto
def fixed_header_length(payload: Column) -> Column:
    """LE u32 frame length from header bytes 5..8 (fixed_framing.go:
    the 4 magic bytes are followed by a little-endian uint32)."""
    hx = F.lower(F.hex(F.substring(payload, 5, 4)))  # stored byte order
    be = F.concat(  # reverse byte pairs: little- → big-endian hex
        F.substring(hx, 7, 2),
        F.substring(hx, 5, 2),
        F.substring(hx, 3, 2),
        F.substring(hx, 1, 2),
    )
    return F.conv(be, 16, 10).cast("bigint")


def fixed_header_valid(payload: Column) -> Column:
    return F.substring(payload, 1, 4) == F.lit(FIXED_MAGIC)


def fixed_frame_body(payload: Column) -> Column:
    return F.substring(payload, F.lit(9), fixed_header_length(payload))


def encode_fixed_frame(body: Column) -> Column:
    """magic + LE u32 length + body, as pure expressions."""
    ln = F.length(body)
    hx = F.lpad(F.lower(F.hex(ln)), 8, "0")  # big-endian hex of length
    le_hex = F.concat(  # reverse to little-endian byte order
        F.substring(hx, 7, 2),
        F.substring(hx, 5, 2),
        F.substring(hx, 3, 2),
        F.substring(hx, 1, 2),
    )
    return F.concat(F.lit(FIXED_MAGIC), F.unhex(le_hex), body)


def parse_proto_schema(schema: str) -> dict:
    """Parse the proto field DSL into a protowire spec:
    `no:name:kind, ...` with kind in {varint, bytes, str, double,
    float, fixed64, fixed32, packed_varint} or
    `message(no:name:kind, ...)` nested recursively — the engine's
    stand-in for a compiled descriptor (word_count.pb.go:32-39 would
    be `1:uuid:bytes, 2:n_gram:str, 3:count:varint`)."""
    spec: dict = {}
    for entry in _split_top_level(schema):
        no_s, name, kind = entry.split(":", 2)
        kind = kind.strip()
        if kind.startswith("message(") and kind.endswith(")"):
            spec[int(no_s)] = (name.strip(), parse_proto_schema(kind[8:-1]))
        else:
            spec[int(no_s)] = (name.strip(), kind)
    return spec


def _split_top_level(s: str) -> list[str]:
    out, depth, cur = [], 0, []
    for ch in s:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    tail = "".join(cur).strip()
    if tail:
        out.append(tail)
    return out


def fixed_framing(df: DataFrame, payload_col: str, schema: str) -> DataFrame:
    """application/x-protobuf in fixed-header frames: magic + LE u32
    length parsed as binary expressions (fixed_framing.go:32-148), the
    protobuf body decoded runtime-free by the protowire reader
    (Arrow-batched mapInPandas) against the schema DSL — nested
    messages and packed repeated fields included. Frames failing the
    magic check are dropped, as the reference's Unpack errors them
    out."""
    return _fixed_framing_spec(df, payload_col, parse_proto_schema(schema))


def fixed_framing_from_descriptor(
    df: DataFrame, payload_col: str, fds_bytes: bytes, message_name: str
) -> DataFrame:
    """fixed_framing driven by a compiled FileDescriptorSet (protoc
    output) instead of the schema DSL — the deployment-shaped front
    end: the descriptor blob a build ships (word_count.pb.go's
    compiled form) resolves to the same protowire spec, decoded by the
    same runtime-free reader. See functions/descriptors.py for the
    supported type surface."""
    from core_spark.functions.descriptors import descriptor_set_to_spec

    spec = descriptor_set_to_spec(fds_bytes, message_name)
    return _fixed_framing_spec(df, payload_col, spec)


def _fixed_framing_spec(df: DataFrame, payload_col: str, spec: dict) -> DataFrame:
    from core_spark.functions.protowire import decode_proto

    p = F.col(payload_col)
    framed = (
        df.filter(fixed_header_valid(p))
        .withColumn("_body", fixed_frame_body(p))
    )
    names = [name for name, _ in spec.values()]
    keep = [c for c in df.columns]
    decoded = decode_proto(framed, "_body", spec, keep_cols=keep)
    return decoded.withColumn("_msg", F.struct(*names)).drop(*names)


register_framing("application/x-ndjson", json_framing)
register_framing("text/csv", csv_framing)
register_framing("application/x-protobuf", fixed_framing)


def decode_journal(
    df: DataFrame, content_type: str, schema: str, payload_col: str = "payload"
) -> DataFrame:
    """Decode a journal's raw payloads per its content-type label and
    lift message fields to columns (Envelope: message + metadata)."""
    framed = framing_for(content_type)(df, payload_col, schema)
    return framed.select("*", "_msg.*").drop("_msg")
