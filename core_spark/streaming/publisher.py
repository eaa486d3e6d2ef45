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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from core_spark.functions.uuid import (
    FLAG_ACK_TXN,
    FLAG_CONTINUE_TXN,
    FLAG_OUTSIDE_TXN,
    build_uuid,
    producer_node,
)


def _clock_expr(order: Column) -> Column:
    """60-bit clock: 100ns-unit wall time plus the caller's order
    column (uuid.go:61-102's timestamp+counter). The full order value
    is added — not masked — so every row of a producer gets a distinct,
    monotone clock; a masked counter would collide past its width and
    read-committed consumers would drop the collisions as duplicates.
    """
    return F.unix_micros(F.current_timestamp()) * 10 + order


def attach_uuids(
    df: DataFrame,
    producer_seed: Column | str,
    order: Column | str,
    flags: int = FLAG_OUTSIDE_TXN,
    uuid_col: str = "uuid",
) -> DataFrame:
    """Stamp a deterministic-producer v1 UUID onto each row (the
    attach-uuids batch pre-processor)."""
    seed = F.col(producer_seed) if isinstance(producer_seed, str) else producer_seed
    order_c = F.col(order) if isinstance(order, str) else order
    return df.withColumn(
        uuid_col,
        build_uuid(producer_node(seed), _clock_expr(order_c), F.lit(flags)),
    )


def publish_committed(df: DataFrame, producer_seed: str, order: str) -> DataFrame:
    """OUTSIDE_TXN publish: rows commit immediately at readers."""
    return attach_uuids(df, producer_seed, order, FLAG_OUTSIDE_TXN)


def publish_uncommitted(df: DataFrame, producer_seed: str, order: str) -> DataFrame:
    """CONTINUE_TXN publish: rows stay pending until the ACK intent."""
    return attach_uuids(df, producer_seed, order, FLAG_CONTINUE_TXN)


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
