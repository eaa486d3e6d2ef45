"""Minimal protobuf wire-format decode — no protobuf runtime needed.

The reference's word-count messages are protobuf
(examples/word-count/word_count.pb.go:32-39: NGramCount{uuid: bytes=1,
n_gram: string=2, count: uint64=3}) carried in fixed-header frames
(message/fixed_framing.go). The general protobuf framing stays stubbed
behind the registry (a schema-compiled runtime belongs there), but the
wire format itself is simple — (tag varint, value) pairs — so schema-
known messages decode in an Arrow-batched `mapInPandas` stage with a
~30-line pure-Python varint reader. This is the engine's "bring a
frame decoder" extension point exercised for real, and the decoder
closure is self-contained (pickled by value — worker processes need no
repo import).

Supported field kinds: varint (wire type 0) → int, length-delimited
(wire type 2) → bytes/str. That covers NGramCount and any similarly
scalar message; nested/packed fields would extend the same loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def decode_proto(
    df: DataFrame,
    payload_col: str,
    fields: dict[int, tuple[str, str]],
) -> DataFrame:
    """Decode protobuf payloads per a {field_no: (name, kind)} map,
    kind in {'varint', 'bytes', 'str'}. Output: doc columns per field
    (missing fields → null). Unknown fields are skipped per proto
    semantics."""
    spec = dict(fields)  # capture a plain dict in the closure
    out_schema = ", ".join(
        f"{name} {'long' if kind == 'varint' else 'binary' if kind == 'bytes' else 'string'}"
        for name, kind in spec.values()
    )

    def decode(batches):
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

        def decode_one(raw: bytes) -> dict:
            out = {name: None for name, _ in spec.values()}
            i = 0
            while i < len(raw):
                tag, i = read_varint(raw, i)
                field_no, wire = tag >> 3, tag & 0x7
                if wire == 0:
                    val, i = read_varint(raw, i)
                elif wire == 2:
                    ln, i = read_varint(raw, i)
                    val = raw[i : i + ln]
                    i += ln
                else:
                    raise ValueError(f"unsupported wire type {wire}")
                if field_no in spec:
                    name, kind = spec[field_no]
                    out[name] = (
                        val if kind != "str" else bytes(val).decode("utf-8")
                    )
            return out

        for pdf in batches:
            decoded = [decode_one(bytes(b)) for b in pdf[payload_col]]
            yield pd.DataFrame(decoded)

    return df.select(payload_col).mapInPandas(decode, schema=out_schema)


def encode_varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        out.append(b | (0x80 if n else 0))
        if not n:
            return bytes(out)


def encode_ngram_count(uuid: bytes, ngram: str, count: int) -> bytes:
    """Test-side encoder for NGramCount (tag = field_no<<3 | wire)."""
    body = b""
    body += encode_varint(1 << 3 | 2) + encode_varint(len(uuid)) + uuid
    ng = ngram.encode()
    body += encode_varint(2 << 3 | 2) + encode_varint(len(ng)) + ng
    body += encode_varint(3 << 3 | 0) + encode_varint(count)
    return body
