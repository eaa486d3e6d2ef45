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
