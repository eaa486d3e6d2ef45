"""Read-committed sequencing / exactly-once dedup — batch formulation.

This is the Spark re-expression of the reference's signature operator,
the message Sequencer (message/sequencer.go:12-37 design,
:158-341 QueueUncommitted outcome table, :344-462 Step): given a
journal's messages in offset order, produce the *read-committed* view:

  1. ACK_TXN messages (flags=2) are protocol barriers, not data — they
     commit or roll back a producer's pending CONTINUE_TXN run and are
     not themselves emitted.
  2. Messages without a UUID (clock == 0) pass straight through
     (sequencer.go:176-187 zero-clock rule) — no dedup is possible.
  3. Duplicate delivery of the same (producer, clock) keeps only the
     first occurrence in offset order (dedup of at-least-once
     redelivery, sequencer.go outcome QueueDup).
  4. An OUTSIDE_TXN message (flags=0) commits immediately — unless its
     clock is <= the producer's highest ACK clock seen at smaller
     offsets (a late replay behind the producer's committed horizon).
  5. A CONTINUE_TXN message (flags=1) is pending until the producer's
     *next* ACK at a larger offset: committed iff that ACK exists and
     ack.clock >= msg.clock; an ACK with a smaller clock rolls the
     pending run back (QueueContinueCommit / rollback outcomes); a
     pending run with no following ACK is never emitted (still open at
     end of input).

Physical shape (why this scales to 100 TB): everything is window
functions over a single hash-partitioning on `producer` — one shuffle,
no joins, no Python. Per-producer state is the reference's own
scaling unit (ProducerStates in the checkpoint,
consumer/protocol/protocol.proto:294-304), so skew is bounded by
producer fan-in exactly as in the reference. The streaming variant
with true incremental state lives in core_spark/streaming/.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from core_spark.functions.uuid import FLAG_ACK_TXN, FLAG_CONTINUE_TXN, FLAG_OUTSIDE_TXN


def read_committed(
    df: DataFrame,
    producer: str = "producer",
    clock: str = "clock",
    flags: str = "flags",
    offset: str = "offset",
) -> DataFrame:
    """Filter `df` (one journal's messages) to its read-committed view.

    Emits data rows only (never ACKs), preserving all input columns.
    """
    p, c, fl, off = (F.col(x) for x in (producer, clock, flags, offset))
    is_ack: Column = fl == FLAG_ACK_TXN

    w_prod = W.partitionBy(producer).orderBy(offset)
    # Highest ACK clock at strictly-smaller offsets (committed horizon).
    prior_ack = F.max(F.when(is_ack, c)).over(
        w_prod.rowsBetween(W.unboundedPreceding, -1)
    )
    # Clock of the first ACK at a strictly-larger offset. Expressed as
    # a *growing* frame over the reversed order (last non-null before
    # the current row, scanning descending offsets): Spark evaluates
    # growing frames incrementally in O(n), whereas the equivalent
    # shrinking frame (1 FOLLOWING → UNBOUNDED FOLLOWING) rescans per
    # row — O(n²) per producer, measured 10x slower at sf0.1.
    w_rev = W.partitionBy(producer).orderBy(F.desc(offset))
    next_ack = F.last(F.when(is_ack, c), ignorenulls=True).over(
        w_rev.rowsBetween(W.unboundedPreceding, -1)
    )
    # First-delivery rank among identical (producer, clock). ACKs rank
    # separately so a barrier can never mask a data row's delivery.
    dup_rn = F.row_number().over(
        W.partitionBy(p, c, is_ack.cast("int")).orderBy(off)
    )

    annotated = df.withColumns(
        {
            "_prior_ack": prior_ack,
            "_next_ack": next_ack,
            "_dup_rn": dup_rn,
        }
    )

    no_uuid = c == 0
    fresh = (F.col("_dup_rn") == 1) & (
        F.col("_prior_ack").isNull() | (c > F.col("_prior_ack"))
    )
    emit_outside = (fl == FLAG_OUTSIDE_TXN) & fresh
    emit_continue = (
        (fl == FLAG_CONTINUE_TXN)
        & fresh
        & F.col("_next_ack").isNotNull()
        & (F.col("_next_ack") >= c)
    )

    return (
        annotated.filter(~is_ack & (no_uuid | emit_outside | emit_continue))
        .drop("_prior_ack", "_next_ack", "_dup_rn")
    )


def duck_read_committed(
    inner_sql: str,
    producer: str = "producer",
    clock: str = "clock",
    flags: str = "flags",
    offset: str = "offset",
    select_cols: str = "*",
) -> str:
    """DuckDB SQL computing the identical read-committed view over the
    relation produced by `inner_sql` — the oracle twin of
    `read_committed`, kept adjacent so the two formulations cannot
    drift silently."""
    return f"""
    WITH _msgs AS ({inner_sql}),
    _annot AS (
      SELECT _msgs.*,
        MAX(CASE WHEN {flags} = 2 THEN {clock} END) OVER (
          PARTITION BY {producer} ORDER BY {offset}
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS _prior_ack,
        FIRST_VALUE(CASE WHEN {flags} = 2 THEN {clock} END IGNORE NULLS) OVER (
          PARTITION BY {producer} ORDER BY {offset}
          ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS _next_ack,
        ROW_NUMBER() OVER (
          PARTITION BY {producer}, {clock}, ({flags} = 2)
          ORDER BY {offset}) AS _dup_rn
      FROM _msgs
    )
    SELECT {select_cols} FROM _annot
    WHERE {flags} <> 2 AND (
      {clock} = 0
      OR (_dup_rn = 1
          AND ({clock} > COALESCE(_prior_ack, -1))
          AND ({flags} = 0
               OR (_next_ack IS NOT NULL AND _next_ack >= {clock}))))
    """
