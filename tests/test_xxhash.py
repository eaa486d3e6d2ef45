"""XXH64 pinned two ways: the specification's own published test
vectors, and Spark SQL's xxhash64 builtin (an independent JVM
implementation, seed 42 over binary)."""

from core_spark.functions.xxhash import xxh64


def test_spec_vectors():
    """xxhash_spec.md test vectors (seed 0 and the prime seed)."""
    prime = 2654435761
    sample = bytes(
        # the spec generates 101 bytes from a PRNG; published
        # digests below are for b"" and short ASCII instead (the
        # widely-mirrored reference vectors)
    )
    assert xxh64(b"") == 0xEF46DB3751D8E999
    assert xxh64(b"", prime) == 0xAC75FDA2929B17EF
    assert xxh64(b"a") == 0xD24EC4F1A98C6E5B
    assert xxh64(b"abc") == 0x44BC2CF5AD770999
    assert xxh64(b"as") == 0x1C330FB2D66BE179
    assert xxh64(b"asd") == 0x631C37CE72A97393
    assert xxh64(b"asdf") == 0x415872F599CEA71E
    # crosses the 32-byte stripe path
    assert (
        xxh64(b"Call me Ishmael. Some years ago--never mind how long "
              b"precisely-", 0)
        == 0x02A2E85470D6FD96
    )


def test_pins_against_spark_jvm_xxhash64(spark):
    """Spark SQL's xxhash64 over BINARY is XXH64(bytes, seed=42) —
    an independent JVM implementation; every length class (empty,
    <4, <8, <32, >=32, unaligned tails) must agree."""
    import random

    from pyspark.sql import functions as F

    rng = random.Random(0x5EED)
    blobs = [b"", b"x", b"abc", b"asdf", b"12345678", b"123456789"]
    blobs += [
        bytes(rng.randrange(256) for _ in range(rng.choice(
            [5, 7, 15, 31, 32, 33, 63, 64, 100, 1000]
        )))
        for _ in range(40)
    ]
    df = spark.createDataFrame(
        [(i, b) for i, b in enumerate(blobs)], "i int, b binary"
    ).select("i", F.xxhash64("b").alias("h"))
    got = {r["i"]: r["h"] for r in df.collect()}
    for i, b in enumerate(blobs):
        want = xxh64(b, seed=42)
        # Spark returns signed int64
        if want >= 1 << 63:
            want -= 1 << 64
        assert got[i] == want, (i, len(b))
