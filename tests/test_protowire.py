"""Protobuf wire decode: NGramCount round-trip through fixed frames —
the word-count message path end-to-end without a protobuf runtime."""

from pyspark.sql import functions as F

from core_spark.functions.framing import encode_fixed_frame, fixed_frame_body
from core_spark.functions.protowire import decode_proto, encode_ngram_count

NGRAM_FIELDS = {1: ("uuid", "bytes"), 2: ("n_gram", "str"), 3: ("count", "varint")}


def test_ngram_count_roundtrip(spark):
    rows = [
        (i, encode_ngram_count(bytes([i] * 16), f"gram {i}", i * 300 + 7))
        for i in range(50)
    ]
    framed = spark.createDataFrame(rows, "i long, body binary").withColumn(
        "payload", encode_fixed_frame(F.col("body"))
    )
    # strip the fixed-frame header, then decode the protobuf body
    bodies = framed.select(fixed_frame_body(F.col("payload")).alias("msg"))
    out = decode_proto(bodies, "msg", NGRAM_FIELDS)
    got = {(r["n_gram"], r["count"], bytes(r["uuid"])[0]) for r in out.collect()}
    assert got == {(f"gram {i}", i * 300 + 7, i) for i in range(50)}


def test_unknown_fields_skipped(spark):
    # field 9 (varint) not in the schema must be ignored
    from core_spark.functions.protowire import encode_varint

    body = encode_ngram_count(b"u", "x", 5) + encode_varint(9 << 3 | 0) + encode_varint(99)
    df = spark.createDataFrame([(body,)], "msg binary")
    r = decode_proto(df, "msg", NGRAM_FIELDS).first()
    assert r["n_gram"] == "x" and r["count"] == 5


def test_multibyte_varints(spark):
    big = 2**45 + 12345
    df = spark.createDataFrame(
        [(encode_ngram_count(b"", "big", big),)], "msg binary"
    )
    assert decode_proto(df, "msg", NGRAM_FIELDS).first()["count"] == big


NESTED_FIELDS = {
    1: ("name", "str"),
    2: ("meta", {1: ("shard", "varint"), 2: ("slot", "varint")}),
    3: ("samples", "packed_varint"),
    4: ("score", "double"),
}


def test_nested_and_packed_roundtrip(spark):
    from core_spark.functions.protowire import encode_message, encode_varint

    import struct as s

    bodies = []
    for i in range(20):
        body = encode_message(
            {
                "name": f"doc-{i}",
                "meta": {"shard": i % 8, "slot": i * 3},
                "samples": [i, i * 1000, 2**40 + i],
            },
            NESTED_FIELDS,
        )
        # wire-1 double field appended manually (encode_message keeps
        # to varint/bytes kinds)
        body += encode_varint(4 << 3 | 1) + s.pack("<d", i / 4)
        bodies.append((i, body))
    df = spark.createDataFrame(bodies, "i long, msg binary")
    out = decode_proto(df, "msg", NESTED_FIELDS, keep_cols=["i"]).collect()
    assert len(out) == 20
    for r in out:
        i = r["i"]
        assert r["name"] == f"doc-{i}"
        assert r["meta"]["shard"] == i % 8 and r["meta"]["slot"] == i * 3
        assert list(r["samples"]) == [i, i * 1000, 2**40 + i]
        assert r["score"] == i / 4


def test_unpacked_repeated_occurrences_append(spark):
    """proto3 decoders must accept unpacked encodings of packed
    fields: repeated wire-0 occurrences of field 3 accumulate."""
    from core_spark.functions.protowire import encode_varint

    body = b"".join(
        encode_varint(3 << 3 | 0) + encode_varint(v) for v in (7, 8, 9)
    )
    df = spark.createDataFrame([(body,)], "msg binary")
    r = decode_proto(df, "msg", NESTED_FIELDS).first()
    assert list(r["samples"]) == [7, 8, 9]


def test_proto_framing_registry_end_to_end(spark):
    """application/x-protobuf framing: magic check, LE length, DSL
    schema with nesting — bad-magic frames dropped."""
    from core_spark.functions.framing import decode_journal
    from core_spark.functions.protowire import encode_message

    good = [
        (encode_message({"name": f"g{i}", "meta": {"shard": i, "slot": 1}},
                        NESTED_FIELDS),)
        for i in range(10)
    ]
    framed = spark.createDataFrame(good, "body binary").select(
        encode_fixed_frame(F.col("body")).alias("payload")
    )
    junk = spark.createDataFrame([(b"\x00\x01\x02\x03junkjunk",)], "payload binary")
    raw = framed.unionByName(junk)
    out = decode_journal(
        raw,
        "application/x-protobuf",
        "1:name:str, 2:meta:message(1:shard:varint, 2:slot:varint)",
    )
    rows = out.collect()
    assert len(rows) == 10  # junk frame dropped by the magic check
    assert {r["name"] for r in rows} == {f"g{i}" for i in range(10)}
    assert all(r["meta"]["slot"] == 1 for r in rows)


def test_wire_type_mismatch_raises_named(spark):
    """A corrupt tag pairing a length-delimited or fixed-width kind
    with the wrong wire type must raise a named error — never
    fabricate data (bytes(varint) NULs) or unpack a mis-sized
    buffer."""
    import pytest

    from core_spark.functions.framing import _fixed_framing_spec
    from core_spark.functions.protowire import encode_varint

    spec = {1: ("s", "rep_str"), 2: ("d", "double")}
    # field 1 declared rep_str but sent as wire 0 varint
    bad1 = encode_varint(1 << 3 | 0) + encode_varint(5)
    # field 2 declared double but sent as wire 5 (4 bytes)
    bad2 = encode_varint(2 << 3 | 5) + b"\x00" * 4
    for body in (bad1, bad2):
        df = spark.createDataFrame([(body,)], "payload binary").withColumn(
            "payload", encode_fixed_frame(F.col("payload"))
        )
        with pytest.raises(Exception, match="wire type"):
            _fixed_framing_spec(df, "payload", spec).collect()


def test_wire_type_guard_covers_scalar_zigzag_and_packed_floats(spark):
    """The guard must also name corrupt tags for kinds whose decode
    would otherwise crash un-named (or fabricate): scalar zigzag on
    wire 2 (memoryview >> int), packed_float on wire 0 (struct over
    an int), packed_double on wire 5 (mis-sized buffer), and plain
    varint on wire 2 (bytes assigned to an int field)."""
    import pytest

    from core_spark.functions.framing import _fixed_framing_spec
    from core_spark.functions.protowire import encode_varint

    cases = [
        ({1: ("z", "zigzag")},
         encode_varint(1 << 3 | 2) + encode_varint(2) + b"\x01\x02"),
        ({1: ("f", "packed_float")},
         encode_varint(1 << 3 | 0) + encode_varint(5)),
        ({1: ("d", "packed_double")},
         encode_varint(1 << 3 | 5) + b"\x00" * 4),
        ({1: ("v", "varint")},
         encode_varint(1 << 3 | 2) + encode_varint(2) + b"\x01\x02"),
    ]
    for spec, body in cases:
        df = spark.createDataFrame([(body,)], "payload binary").withColumn(
            "payload", encode_fixed_frame(F.col("payload"))
        )
        with pytest.raises(Exception, match="wire type"):
            _fixed_framing_spec(df, "payload", spec).collect()


def test_packed_scalars_still_accept_unpacked_occurrences(spark):
    """The widened guard must not reject LEGAL encodings: a packed
    field may arrive as repeated unpacked occurrences on the scalar's
    own wire type (proto3 parsers must accept both)."""
    import struct

    from core_spark.functions.framing import _fixed_framing_spec
    from core_spark.functions.protowire import encode_varint

    body = (
        encode_varint(1 << 3 | 0) + encode_varint(7)      # unpacked varint
        + encode_varint(2 << 3 | 5) + struct.pack("<f", 1.5)  # unpacked float
        + encode_varint(3 << 3 | 1) + struct.pack("<d", 2.5)  # unpacked double
    )
    spec = {
        1: ("v", "packed_varint"),
        2: ("f", "packed_float"),
        3: ("d", "packed_double"),
    }
    df = spark.createDataFrame([(body,)], "payload binary").withColumn(
        "payload", encode_fixed_frame(F.col("payload"))
    )
    row = _fixed_framing_spec(df, "payload", spec).collect()[0]["_msg"]
    assert list(row["v"]) == [7]
    assert list(row["f"]) == [1.5]
    assert list(row["d"]) == [2.5]
