"""RFC 4122 v1 UUID mint/unpack as pure column expressions.

Mirrors the reference's message identity layer (message/uuid.go:15-31):
- ProducerID: 6 bytes, multicast bit set (uuid.go:34-52) — here the
  node field's multicast bit is bit 40 of the 48-bit node int (LSB of
  the leading octet).
- Clock: 60-bit value = 100ns-resolution timestamp + 4-bit counter,
  total order per producer (uuid.go:61-102).
- Flags: 10 bits in the clock-sequence field (uuid.go:115-121):
  0x0 OUTSIDE_TXN, 0x1 CONTINUE_TXN, 0x2 ACK_TXN.
- BuildUUID packs clock into time_low/time_mid/time_hi+version=1 and
  flags into clock_seq with variant 0b10 (uuid.go:123-135).

Everything is JVM-side expression work (hex/lpad/bit ops) — no UDFs —
so minting UUIDs for a 100 TB ingest is whole-stage-codegen'd. The
duck_* twins emit DuckDB SQL computing identical strings for the
oracle harness.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

FLAG_OUTSIDE_TXN = 0
FLAG_CONTINUE_TXN = 1
FLAG_ACK_TXN = 2


# ------------------------------------------------------------ Spark side
def _hexpad(col: Column, width: int) -> Column:
    return F.lpad(F.lower(F.hex(col)), width, "0")


def build_uuid(producer_node: Column, clock: Column, flags: Column) -> Column:
    """Pack (producer, clock, flags) into a v1 UUID string.

    `producer_node` is the 48-bit node int (multicast bit expected
    set), `clock` the 64-bit clock (60-bit 100ns timestamp in the high
    bits, 4-bit sequence counter in the low bits), `flags` the 10-bit
    flag word. Bit-for-bit the reference layout (uuid.go:123-135):
    time_low/mid/hi carry clock>>4 and the 4 counter bits land in
    clock_seq bits 10-13, so UUIDs are wire-compatible with
    reference-minted ones (asserted against an independent Python
    restatement of BuildUUID in tests/test_uuid.py).
    """
    time_low = F.shiftrightunsigned(clock, 4).bitwiseAND(F.lit(0xFFFFFFFF))
    time_mid = F.shiftrightunsigned(clock, 36).bitwiseAND(F.lit(0xFFFF))
    time_hi_ver = F.shiftrightunsigned(clock, 52).bitwiseAND(F.lit(0x0FFF)) + F.lit(
        0x1000
    )
    clock_seq = (
        F.shiftleft(clock.bitwiseAND(F.lit(0xF)), 10)
        + flags.bitwiseAND(F.lit(0x3FF))
        + F.lit(0x8000)
    )
    return F.concat_ws(
        "-",
        _hexpad(time_low, 8),
        _hexpad(time_mid, 4),
        _hexpad(time_hi_ver, 4),
        _hexpad(clock_seq, 4),
        _hexpad(producer_node, 12),
    )


def producer_node(seed: Column) -> Column:
    """Deterministic 48-bit producer node from a seed column, multicast
    bit set — the testable analog of NewProducerID's 6 random bytes."""
    from core_spark.functions.hashing import md5i32

    base = F.shiftleft(md5i32(seed.cast("string")), 16)
    return base.bitwiseOR(F.lit(1 << 40))


def uuid_clock(col: Column) -> Column:
    """Unpack the full 64-bit clock from a v1 UUID string
    (uuid.go:104-110 GetClock): timestamp bits from time_low/mid/hi
    shifted up 4, plus the 4 sequence-counter bits from clock_seq
    bits 10-13 (`uuid[8]>>2 & 0xf`)."""
    hi = F.conv(F.substring(col, 16, 3), 16, 10).cast("bigint")
    mid = F.conv(F.substring(col, 10, 4), 16, 10).cast("bigint")
    low = F.conv(F.substring(col, 1, 8), 16, 10).cast("bigint")
    seq = F.shiftright(F.conv(F.substring(col, 20, 2), 16, 10).cast("bigint"), 2)
    return (
        F.shiftleft(hi, 52)
        + F.shiftleft(mid, 36)
        + F.shiftleft(low, 4)
        + seq.bitwiseAND(F.lit(0xF))
    )


def uuid_flags(col: Column) -> Column:
    """Unpack the 10-bit flags word (uuid.go:104-113)."""
    return (
        F.conv(F.substring(col, 20, 4), 16, 10)
        .cast("bigint")
        .bitwiseAND(F.lit(0x3FF))
    )


def uuid_producer(col: Column) -> Column:
    """Unpack the producer node as its 12-hex-char string form."""
    return F.substring(col, 25, 12)


# ----------------------------------------------------------- DuckDB side
def duck_hexpad(expr: str, width: int) -> str:
    return f"lpad(lower(to_hex({expr})), {width}, '0')"


def duck_build_uuid(node: str, clock: str, flags: str) -> str:
    return (
        f"{duck_hexpad(f'(({clock}) >> 4) & 4294967295', 8)} || '-' || "
        f"{duck_hexpad(f'(({clock}) >> 36) & 65535', 4)} || '-' || "
        f"{duck_hexpad(f'((({clock}) >> 52) & 4095) + 4096', 4)} || '-' || "
        f"{duck_hexpad(f'((({clock}) & 15) * 1024) + (({flags}) & 1023) + 32768', 4)}"
        f" || '-' || {duck_hexpad(node, 12)}"
    )


def duck_producer_node(seed_expr: str) -> str:
    from core_spark.functions.hashing import duck_md5i32

    return f"(({duck_md5i32(f'CAST({seed_expr} AS VARCHAR)')} << 16) | {1 << 40})"


def duck_uuid_clock(expr: str) -> str:
    return (
        f"((CAST('0x' || substr({expr}, 16, 3) AS BIGINT) << 52) + "
        f"(CAST('0x' || substr({expr}, 10, 4) AS BIGINT) << 36) + "
        f"(CAST('0x' || substr({expr}, 1, 8) AS BIGINT) << 4) + "
        f"((CAST('0x' || substr({expr}, 20, 2) AS BIGINT) >> 2) & 15))"
    )


def duck_uuid_flags(expr: str) -> str:
    return f"(CAST('0x' || substr({expr}, 20, 4) AS BIGINT) & 1023)"


def duck_uuid_producer(expr: str) -> str:
    return f"substr({expr}, 25, 12)"
