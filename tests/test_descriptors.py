"""Compiled-descriptor framing: a FileDescriptorSet blob (what protoc
emits) resolves to the protowire spec and decodes fixed frames — no
protobuf runtime anywhere.

The fixture descriptor bytes are built with our own protowire encoder:
descriptor.proto is itself a protobuf message with a frozen public
layout, so hand-encoding FileDescriptorSet { file { package,
message_type { name, field{...} } } } produces exactly the bytes
protoc would (field ordering aside, which the wire format does not
care about). Reference shapes: word_count.pb.go:32-39 (NGramCount),
message/fixed_framing.go:32-148 (frame header).
"""

import pytest
from pyspark.sql import functions as F

from core_spark.functions.descriptors import descriptor_set_to_spec
from core_spark.functions.framing import (
    encode_fixed_frame,
    fixed_framing_from_descriptor,
)
from core_spark.functions.protowire import (
    encode_message,
    encode_ngram_count,
    encode_varint,
)

# descriptor.proto field specs (the frozen public subset we encode)
_FIELD_SPEC = {
    1: ("name", "str"),
    3: ("number", "varint"),
    4: ("label", "varint"),
    5: ("type", "varint"),
    6: ("type_name", "str"),
}
_NAME_ONLY = {1: ("name", "str")}
_FILE_HEAD = {1: ("name", "str"), 2: ("package", "str")}


def _sub(no: int, payload: bytes) -> bytes:
    return encode_varint(no << 3 | 2) + encode_varint(len(payload)) + payload


def _field(name, number, ftype, label=1, type_name=None) -> bytes:
    vals = {"name": name, "number": number, "label": label, "type": ftype}
    if type_name:
        vals["type_name"] = type_name
    return encode_message(vals, _FIELD_SPEC)


def _message(name: str, *fields: bytes) -> bytes:
    body = encode_message({"name": name}, _NAME_ONLY)
    for f in fields:
        body += _sub(2, f)  # DescriptorProto.field = 2
    return body


def _file(package: str, *messages: bytes) -> bytes:
    body = encode_message(
        {"name": f"{package}.proto", "package": package}, _FILE_HEAD
    )
    for m in messages:
        body += _sub(4, m)  # FileDescriptorProto.message_type = 4
    return body


@pytest.fixture(scope="module")
def fds() -> bytes:
    """FileDescriptorSet with NGramCount (uuid bytes=1, n_gram str=2,
    count uint64=3 — word_count.pb.go:32-39) plus a message exercising
    nesting and packed repeated."""
    ngram = _message(
        "NGramCount",
        _field("uuid", 1, 12),  # TYPE_BYTES
        _field("n_gram", 2, 9),  # TYPE_STRING
        _field("count", 3, 4),  # TYPE_UINT64
    )
    inner = _message("Inner", _field("tag", 1, 9), _field("weight", 2, 1))
    outer = _message(
        "Outer",
        _field("id", 1, 3),  # TYPE_INT64
        _field("inner", 2, 11, type_name=".examples.word_count.Inner"),
        _field("vals", 3, 4, label=3),  # repeated uint64
    )
    return _sub(1, _file("examples.word_count", ngram, inner, outer))


def test_descriptor_resolves_to_spec(fds):
    spec = descriptor_set_to_spec(fds, "examples.word_count.NGramCount")
    assert spec == {
        1: ("uuid", "bytes"),
        2: ("n_gram", "str"),
        3: ("count", "varint"),
    }
    spec2 = descriptor_set_to_spec(fds, ".examples.word_count.Outer")
    assert spec2[1] == ("id", "varint2c")  # int64: signed varint
    assert spec2[3] == ("vals", "packed_varint")  # uint64: unsigned
    assert spec2[2] == ("inner", {1: ("tag", "str"), 2: ("weight", "double")})


def test_unknown_message_and_unsupported_types(fds):
    with pytest.raises(KeyError, match="not in descriptor set"):
        descriptor_set_to_spec(fds, "examples.word_count.Missing")
    # sint32/64 map to zigzag kinds (scalar + repeated)
    sint = _sub(
        1,
        _file("p", _message(
            "S",
            _field("z", 1, 17),            # TYPE_SINT32
            _field("zs", 2, 18, label=3),  # repeated TYPE_SINT64
        )),
    )
    assert descriptor_set_to_spec(sint, "p.S") == {
        1: ("z", "zigzag"), 2: ("zs", "packed_zigzag"),
    }
    # repeated sfixed32 remains unsupported by name
    rf = _sub(
        1, _file("p", _message("R", _field("d", 1, 15, label=3)))
    )
    with pytest.raises(NotImplementedError, match="repeated field"):
        descriptor_set_to_spec(rf, "p.R")


def test_zigzag_repeated_and_map_round_trip(spark):
    """sint zigzag (scalar + packed), repeated string, repeated
    nested message, and a proto map (compiled form: repeated
    MapEntry{key=1, value=2}) — encode with the test-side encoder,
    decode through descriptor-driven framing, recover everything."""
    from core_spark.functions.framing import _fixed_framing_spec
    from core_spark.functions.protowire import schema_of

    entry = _message(
        "CountsEntry", _field("key", 1, 9), _field("value", 2, 3)
    )
    inner = _message("Tag", _field("name", 1, 9), _field("w", 2, 17))
    m = (
        _message(
            "M",
            _field("delta", 1, 18),                 # sint64
            _field("steps", 2, 17, label=3),        # repeated sint32
            _field("labels", 3, 9, label=3),        # repeated string
            _field("tags", 4, 11, label=3, type_name=".p.M.Tag"),
            _field("counts", 5, 11, label=3,
                   type_name=".p.M.CountsEntry"),   # map<string,int64>
        )
        + _sub(3, inner)   # DescriptorProto.nested_type = 3
        + _sub(3, entry)
    )
    spec = descriptor_set_to_spec(_sub(1, _file("p", m)), "p.M")
    assert spec[1] == ("delta", "zigzag")
    assert spec[2] == ("steps", "packed_zigzag")
    assert spec[3] == ("labels", "rep_str")
    assert spec[4][1] == [{1: ("name", "str"), 2: ("w", "zigzag")}]
    assert spec[5][1] == [{1: ("key", "str"), 2: ("value", "varint2c")}]
    assert "array<struct<name string, w long>>" in schema_of(spec)

    body = encode_message(
        {
            "delta": -(2**40) - 3,
            "steps": [-1, 0, 7, -(2**31 - 1)],
            "labels": ["alpha", "βήτα", ""],
            "tags": [{"name": "x", "w": -9}, {"name": "y", "w": 4}],
            "counts": [
                {"key": "a", "value": 1}, {"key": "b", "value": -2},
            ],
        },
        spec,
    )
    df = spark.createDataFrame([(body,)], "payload binary").withColumn(
        "payload", encode_fixed_frame(F.col("payload"))
    )
    r = _fixed_framing_spec(df, "payload", spec).select("_msg.*").first()
    assert r.delta == -(2**40) - 3
    assert r.steps == [-1, 0, 7, -(2**31 - 1)]
    assert r.labels == ["alpha", "βήτα", ""]
    assert [(t.name, t.w) for t in r.tags] == [("x", -9), ("y", 4)]
    assert {e.key: e.value for e in r.counts} == {"a": 1, "b": -2}


def test_repeated_float_embedding_round_trip(spark):
    """repeated float/double — the proto embedding-vector shape —
    decodes to array<float>/array<double> from the packed wire form."""
    import math

    from core_spark.functions.framing import _fixed_framing_spec

    m = _message(
        "Vec",
        _field("id", 1, 3),                 # int64
        _field("embedding", 2, 2, label=3),  # repeated float
        _field("scores", 3, 1, label=3),     # repeated double
    )
    spec = descriptor_set_to_spec(_sub(1, _file("p", m)), "p.Vec")
    assert spec[2] == ("embedding", "packed_float")
    assert spec[3] == ("scores", "packed_double")

    vec = [0.25, -1.5, 3.0, 0.0]
    scores = [1.0 / 3.0, -2.5e300, 0.0]
    body = encode_message(
        {"id": 7, "embedding": vec, "scores": scores}, spec
    )
    df = spark.createDataFrame([(body,)], "payload binary").withColumn(
        "payload", encode_fixed_frame(F.col("payload"))
    )
    r = _fixed_framing_spec(df, "payload", spec).select("_msg.*").first()
    assert r.id == 7
    assert r.embedding == vec  # exactly representable in float32
    assert all(
        math.isclose(a, b, rel_tol=0) for a, b in zip(r.scores, scores)
    )


def test_framed_roundtrip_via_descriptor(spark, fds):
    """Encode NGramCount frames with the test-side encoder, decode via
    the descriptor-driven framing, recover every field."""
    rows = [
        (i, encode_ngram_count(bytes([i] * 16), f"gram-{i}", i * 10))
        for i in range(5)
    ]
    df = spark.createDataFrame(rows, "k long, body binary").withColumn(
        "payload", encode_fixed_frame(F.col("body"))
    )
    out = (
        fixed_framing_from_descriptor(
            df, "payload", fds, "examples.word_count.NGramCount"
        )
        .select("k", "_msg.*")
        .orderBy("k")
        .collect()
    )
    assert [(r.k, bytes(r.uuid), r.n_gram, r["count"]) for r in out] == [
        (i, bytes([i] * 16), f"gram-{i}", i * 10) for i in range(5)
    ]


def test_signedness_mapping(spark):
    """Negative int32/int64 values wire-encode as sign-extended 64-bit
    varints; fixed32 is unsigned in proto. Both decode to the true
    values (the silent-wrong cases the mapping used to have); unsigned
    fixed64 refuses rather than mis-reading '<q'."""
    signed = _sub(
        1,
        _file(
            "p",
            _message(
                "M",
                _field("a", 1, 5),  # int32
                _field("b", 2, 7),  # fixed32 (unsigned)
                _field("c", 3, 3, label=3),  # repeated int64
            ),
        ),
    )
    spec = descriptor_set_to_spec(signed, "p.M")
    assert spec == {
        1: ("a", "varint2c"),
        2: ("b", "ufixed32"),
        3: ("c", "packed_varint2c"),
    }
    body = encode_message(
        {"a": -42, "b": 0xDEADBEEF, "c": [-1, 7, -(2**40)]}, spec
    )
    df = spark.createDataFrame([(body,)], "payload binary").withColumn(
        "payload", encode_fixed_frame(F.col("payload"))
    )
    from core_spark.functions.framing import _fixed_framing_spec

    r = _fixed_framing_spec(df, "payload", spec).select("_msg.*").first()
    assert (r.a, r.b, r.c) == (-42, 0xDEADBEEF, [-1, 7, -(2**40)])

    ufixed = _sub(1, _file("p", _message("U", _field("x", 1, 6))))
    with pytest.raises(NotImplementedError, match="fixed64"):
        descriptor_set_to_spec(ufixed, "p.U")


def test_truncated_descriptor_raises_named_error():
    """Corrupt/truncated FileDescriptorSet bytes must raise a clear
    ValueError naming the damage, not an IndexError deep in the walk
    or a silent short slice (ADVICE r3)."""
    good = _sub(1, _file("p", _message("M", _field("a", 1, 3))))
    # cut inside a length-delimited field payload
    with pytest.raises(ValueError, match="truncated descriptor"):
        descriptor_set_to_spec(good[: len(good) - 3], "p.M")
    # a varint that runs off the end
    with pytest.raises(ValueError, match="truncated descriptor"):
        descriptor_set_to_spec(b"\x08\xff\xff", "p.M")
