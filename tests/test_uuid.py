"""UUID v1 expressions: mint→unpack round-trip, field layout, and
wire compatibility with the reference packing (message/uuid.go:123-135
BuildUUID / :104-110 GetClock)."""

import uuid as py_uuid

from pyspark.sql import functions as F

from core_spark.functions.uuid import (
    build_uuid,
    producer_node,
    uuid_clock,
    uuid_flags,
    uuid_producer,
)


def _ref_build_uuid(node: int, clock: int, flags: int) -> str:
    """Independent Python restatement of BuildUUID's byte layout
    (uuid.go:123-135): clock>>4 into time fields, the 4 counter bits
    into clock_seq bits 10-13, version 1, variant 0b10."""
    b = bytearray(16)
    b[0:4] = ((clock >> 4) & 0xFFFFFFFF).to_bytes(4, "big")
    b[4:6] = ((clock >> 36) & 0xFFFF).to_bytes(2, "big")
    b[6:8] = (((clock >> 52) & 0x0FFF) | 0x1000).to_bytes(2, "big")
    b[8:10] = ((((clock << 10) & 0x3C00) | flags | 0x8000) & 0xFFFF).to_bytes(2, "big")
    b[10:16] = node.to_bytes(6, "big")
    return str(py_uuid.UUID(bytes=bytes(b)))


def _ref_get_clock(u: str) -> int:
    """GetClock's bit reassembly (uuid.go:104-110)."""
    raw = py_uuid.UUID(u).bytes
    t = int.from_bytes(raw[0:4], "big") << 4
    t |= int.from_bytes(raw[4:6], "big") << 36
    t |= (int.from_bytes(raw[6:8], "big") << 52) & 0xFFFFFFFFFFFFFFFF
    t |= (raw[8] >> 2) & 0xF
    return t


def test_wire_compat_with_reference_layout(spark):
    """Spark-minted UUID strings are byte-identical to the reference
    BuildUUID packing, and uuid_clock decodes reference-minted UUIDs
    (including the 4-bit sequence counter)."""
    cases = [
        (0x011111111111, (1_700_000_000_000_000 * 10 + 122_192_928_000_000_000) << 4 | 0xB, 0x1),
        (0x011111111111, (123_456_789 << 4) | 0xF, 0x2),
        (0x01EE22EE33EE, 1, 0x0),
        (0x01EE22EE33EE, (0x0FFFFFFFFFFFFFF << 4) | 0x9, 0x3FF),
    ]
    df = spark.createDataFrame(cases, "node long, clock long, flags int")
    rows = df.select(
        "node",
        "clock",
        "flags",
        build_uuid(F.col("node"), F.col("clock"), F.col("flags")).alias("u"),
    ).collect()
    for r in rows:
        expect = _ref_build_uuid(r.node, r.clock, r.flags)
        assert r.u == expect, f"packing mismatch: {r.u} != {expect}"
    # decode a reference-minted UUID with the engine's unpack exprs
    ref_minted = [
        (_ref_build_uuid(n, c, f), c, f) for (n, c, f) in cases
    ]
    back = (
        spark.createDataFrame(ref_minted, "u string, clock long, flags int")
        .select(
            "clock",
            "flags",
            uuid_clock(F.col("u")).alias("c2"),
            uuid_flags(F.col("u")).alias("f2"),
            F.col("u").alias("u"),
        )
        .collect()
    )
    for r in back:
        assert r.c2 == r.clock == _ref_get_clock(r.u)
        assert r.f2 == r.flags


def test_roundtrip_and_layout(spark):
    df = spark.createDataFrame(
        [(i, 10_000_000_000 + i * 7, i % 3) for i in range(50)],
        "seed long, clock long, flags int",
    )
    minted = df.select(
        "seed",
        "clock",
        "flags",
        build_uuid(producer_node(F.col("seed")), F.col("clock"), F.col("flags")).alias(
            "u"
        ),
    )
    rows = minted.select(
        "clock",
        "flags",
        "u",
        uuid_clock(F.col("u")).alias("c2"),
        uuid_flags(F.col("u")).alias("f2"),
        uuid_producer(F.col("u")).alias("p2"),
    ).collect()
    for r in rows:
        assert r.c2 == r.clock and r.f2 == r.flags
        parsed = py_uuid.UUID(r.u)  # RFC 4122-parseable
        assert parsed.version == 1
        assert parsed.variant == py_uuid.RFC_4122
        # node multicast bit set, as NewProducerID requires
        assert (parsed.node >> 40) & 0x01 == 1
        assert f"{parsed.node:012x}" == r.p2
