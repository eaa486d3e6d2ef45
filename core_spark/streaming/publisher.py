"""Publisher: UUID-stamping for committed and transactional publishes.

Reference: message/publisher.go — PublishCommitted mints
OUTSIDE_TXN UUIDs (:104-112,190-218); PublishUncommitted mints
CONTINUE_TXN and BuildAckIntents emits one ACK_TXN per touched journal
(:114-188). cmd/gazctl/gazctlcmd/attach_uuids.go:13-50 is the batch
form for exactly-once file ingest.

All minting is pure column expressions (functions/uuid.py) — a 100 TB
ingest stamps UUIDs inside whole-stage codegen.
"""

from __future__ import annotations

import time

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from core_spark.functions.uuid import (
    FLAG_ACK_TXN,
    FLAG_CONTINUE_TXN,
    FLAG_OUTSIDE_TXN,
    build_uuid,
    producer_node,
)

# 100ns ticks between the RFC 4122 epoch (1582-10-15) and the Unix
# epoch — the reference's g1582ns100 (uuid.go:27-29), so minted clocks
# are numerically identical to reference-minted ones.
UUID_EPOCH_100NS = 122_192_928_000_000_000


def _clock_base(publish_micros: int) -> int:
    """Clock base for a publish instant: 100ns-unit UUID-epoch wall
    time shifted 4 for the sequence counter (uuid.go:76-84 Update's
    `(UnixNano()/100 + g1582ns100) << 4`)."""
    return (publish_micros * 10 + UUID_EPOCH_100NS) << 4


def _clock_expr(order: Column, publish_micros: int) -> Column:
    """64-bit clock: the publish instant's clock base plus the
    caller's order column (uuid.go:61-102's timestamp+counter). The
    full order value is added — not masked — so every row of a
    producer gets a distinct, monotone clock; a masked counter would
    collide past its width and read-committed consumers would drop the
    collisions as duplicates (carries past the 4 counter bits advance
    the timestamp, exactly as Clock.Tick does).

    The wall-clock component is a *driver-side literal* captured once
    per publish call — not current_timestamp() — so task retries and
    repeated actions over the same lineage re-mint byte-identical
    UUIDs instead of un-dedupable fresh ones (the reference likewise
    mints once, in the Publisher, not per-access).
    """
    return F.lit(_clock_base(publish_micros)) + order


def attach_uuids(
    df: DataFrame,
    producer_seed: Column | str,
    order: Column | str,
    flags: int = FLAG_OUTSIDE_TXN,
    uuid_col: str = "uuid",
    publish_micros: int | None = None,
) -> DataFrame:
    """Stamp a deterministic-producer v1 UUID onto each row (the
    attach-uuids batch pre-processor). `publish_micros` pins the
    publish instant; it defaults to the wall clock at *call* time,
    captured once on the driver."""
    seed = F.col(producer_seed) if isinstance(producer_seed, str) else producer_seed
    order_c = F.col(order) if isinstance(order, str) else order
    if publish_micros is None:
        publish_micros = int(time.time() * 1_000_000)
    return df.withColumn(
        uuid_col,
        build_uuid(producer_node(seed), _clock_expr(order_c, publish_micros), F.lit(flags)),
    )


def publish_committed(
    df: DataFrame, producer_seed: str, order: str, publish_micros: int | None = None
) -> DataFrame:
    """OUTSIDE_TXN publish: rows commit immediately at readers."""
    return attach_uuids(
        df, producer_seed, order, FLAG_OUTSIDE_TXN, publish_micros=publish_micros
    )


def publish_uncommitted(
    df: DataFrame, producer_seed: str, order: str, publish_micros: int | None = None
) -> DataFrame:
    """CONTINUE_TXN publish: rows stay pending until the ACK intent."""
    return attach_uuids(
        df, producer_seed, order, FLAG_CONTINUE_TXN, publish_micros=publish_micros
    )


def ack_intents(df: DataFrame, producer_seed: str) -> DataFrame:
    """One ACK_TXN marker row per producer in `df` (BuildAckIntents):
    its clock must cover every published clock, so readers release the
    whole run."""
    seed = F.col(producer_seed)
    return (
        df.groupBy(producer_seed)
        .agg(F.max("clock").alias("ack_clock"))
        .select(
            seed,
            F.col("ack_clock").alias("clock"),
            F.lit(FLAG_ACK_TXN).alias("flags"),
            build_uuid(
                producer_node(seed), F.col("ack_clock"), F.lit(FLAG_ACK_TXN)
            ).alias("uuid"),
        )
    )
