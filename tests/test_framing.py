"""Framing registry: JSON/CSV decode, fixed-frame header round-trip,
content-type dispatch."""

import pytest
from pyspark.sql import functions as F

from core_spark.functions.framing import (
    FIXED_MAGIC,
    decode_journal,
    encode_fixed_frame,
    fixed_frame_body,
    fixed_header_length,
    fixed_header_valid,
    framing_for,
)


@pytest.fixture
def raw(spark):
    rows = [(i, f'{{"k": {i}, "name": "msg{i}"}}') for i in range(20)]
    return spark.createDataFrame(rows, "off long, line string").withColumn(
        "payload", F.encode("line", "UTF-8")
    )


def test_json_framing(spark, raw):
    out = decode_journal(raw, "application/x-ndjson", "k long, name string")
    got = {(r.k, r.name) for r in out.select("k", "name").collect()}
    assert got == {(i, f"msg{i}") for i in range(20)}


def test_csv_framing(spark):
    df = spark.createDataFrame(
        [(i, f"{i},label{i},{i * 1.5}") for i in range(10)],
        "off long, line string",
    ).withColumn("payload", F.encode("line", "UTF-8"))
    out = decode_journal(df, "text/csv", "id long, label string, v double")
    got = {(r.id, r.label, r.v) for r in out.select("id", "label", "v").collect()}
    assert got == {(i, f"label{i}", i * 1.5) for i in range(10)}


def test_fixed_frame_roundtrip(spark):
    bodies = spark.createDataFrame(
        [(i, ("x" * (i * 37 + 1)).encode()) for i in range(8)],
        "i long, body binary",
    )
    framed = bodies.withColumn("payload", encode_fixed_frame(F.col("body")))
    parsed = framed.select(
        "i",
        "body",
        fixed_header_valid(F.col("payload")).alias("ok"),
        fixed_header_length(F.col("payload")).alias("ln"),
        fixed_frame_body(F.col("payload")).alias("out"),
    )
    for r in parsed.collect():
        assert r.ok is True
        assert r.ln == len(r.body)
        assert bytes(r.out) == bytes(r.body)
    # corrupted magic is rejected
    bad = framed.withColumn(
        "payload", F.concat(F.lit(b"\x00\x00\x00\x00"), F.col("payload"))
    )
    assert bad.filter(fixed_header_valid(F.col("payload"))).count() == 0
    assert FIXED_MAGIC == bytes([0x66, 0x33, 0x93, 0x36])


def test_protobuf_schema_dsl_parses_nested():
    from core_spark.functions.framing import parse_proto_schema

    spec = parse_proto_schema(
        "1:uuid:bytes, 2:n_gram:str, 3:count:varint, "
        "4:meta:message(1:shard:varint, 2:slot:varint), 5:xs:packed_varint"
    )
    assert spec[2] == ("n_gram", "str")
    assert spec[4][0] == "meta" and spec[4][1][2] == ("slot", "varint")
    assert spec[5] == ("xs", "packed_varint")


def test_unknown_content_type(spark):
    with pytest.raises(ValueError, match="no framing registered"):
        framing_for("application/x-mystery")
