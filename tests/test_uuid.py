"""UUID v1 expressions: mint→unpack round-trip and field layout
(message/uuid.go:123-135 packing)."""

import uuid as py_uuid

from pyspark.sql import functions as F

from core_spark.functions.uuid import (
    build_uuid,
    producer_node,
    uuid_clock,
    uuid_flags,
    uuid_producer,
)


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
