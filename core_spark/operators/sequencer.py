"""Read-committed sequencing / exactly-once dedup — batch formulation.

This is the Spark re-expression of the reference's signature operator,
the message Sequencer (message/sequencer.go:12-37 design,
:158-341 QueueUncommitted outcome table, :344-462 Step): given a
journal's messages in offset order, produce the *read-committed* view.

Per-producer sequential semantics (state = min_clock exclusive
horizon, max_clock, pending run; initialized to first_clock-1):

  1. ACK_TXN messages (flags=2) are protocol barriers, not data — they
     commit or roll back a producer's pending CONTINUE_TXN run and are
     not themselves emitted.
  2. Messages without a UUID (clock == 0) pass straight through
     (sequencer.go:176-187 zero-clock rule) and never touch state —
     no dedup is possible.
  3. An OUTSIDE_TXN message (flags=0; unknown flags fall through to
     OUTSIDE, :204-207) is dropped iff clock <= min_clock, else
     commits immediately AND clobbers any pending CONTINUE run
     (:315-325), leaving min=max=clock.
  4. A CONTINUE_TXN message (flags=1) is dropped iff clock <=
     min_clock or clock <= max_clock (duplicate delivery), else joins
     the pending run with max_clock=clock.
  5. An ACK_TXN with clock > min_clock commits pending messages with
     clock <= ack clock (higher-clock pending is dropped, :326-328);
     with clock <= min_clock it ROLLS BACK, discarding pending. In
     BOTH cases the producer resets to min=max=ack clock — a rollback
     RESETS THE HORIZON DOWNWARD (:236-257, QueueAckRollback) so that
     re-sends following an upstream checkpoint recovery are accepted
     again (exactly-once degrades to at-least-once over the replayed
     interval rather than dropping messages outright).

Window derivation (why this is expressible without a sequential
fold): every ACK and every committed OUTSIDE is a *barrier* leaving
(min=max=its clock, no pending). Within an ACK-delimited segment,
committed OUTSIDE clocks are strictly increasing, so the horizon at
any row is max(segment-opening ACK clock, all prior OUTSIDE clocks in
the segment) — uncommitted OUTSIDEs are dominated and harmless to
include, which breaks the would-be recursion of "committed depends on
the horizon depends on committed". Given OUTSIDE commit flags,
barriers are known; within a barrier-delimited sub-segment max_clock
is max(barrier clock, prior CONTINUE clocks), dominated likewise. A
CONTINUE emits iff it joined the run, no barrier intervenes before
the segment's closing ACK (equal barrier counts), and that ACK
commits with clock >= its own.

Physical shape (why this scales to 100 TB): everything is window
functions over a single hash-partitioning on `producer` — one
shuffle, no joins, no Python, and every frame is growing (reversed
sort for the look-ahead), so evaluation is O(n) per producer.
Per-producer state is the reference's own scaling unit
(ProducerStates in the checkpoint,
consumer/protocol/protocol.proto:294-304), so skew is bounded by
producer fan-in exactly as in the reference. The streaming variant
with true incremental state lives in core_spark/streaming/.

Cross-validated against an imperative Python restatement and the
DuckDB twin below on fuzzed + directed interleavings
(tests/test_sequencer.py), including post-recovery ACK-rollback
replays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from core_spark.functions.uuid import FLAG_ACK_TXN, FLAG_CONTINUE_TXN


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
    c, fl = F.col(clock), F.col(flags)
    nonzero = c != 0
    is_ack = nonzero & (fl == FLAG_ACK_TXN)
    is_cont = nonzero & (fl == FLAG_CONTINUE_TXN)
    is_out = nonzero & ~(fl == FLAG_ACK_TXN) & ~(fl == FLAG_CONTINUE_TXN)

    w = W.partitionBy(producer).orderBy(offset)
    w_prev = w.rowsBetween(W.unboundedPreceding, -1)
    w_cur = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    # Look-ahead expressed as a *growing* frame over the reversed
    # order: Spark evaluates growing frames incrementally in O(n); the
    # equivalent shrinking frame (1 FOLLOWING → UNBOUNDED FOLLOWING)
    # rescans per row — O(n²) per producer, measured 10x at sf0.1.
    w_rev_prev = (
        W.partitionBy(producer)
        .orderBy(F.desc(offset))
        .rowsBetween(W.unboundedPreceding, -1)
    )

    # Stage 1: ACK-segment index, segment-opening horizon, init base.
    s1 = df.withColumns(
        {
            "_isack": is_ack,
            "_iscont": is_cont,
            "_isout": is_out,
            "_seg": F.count(F.when(is_ack, 1)).over(w_prev),
            "_a0": F.coalesce(
                F.last(F.when(is_ack, c), ignorenulls=True).over(w_prev),
                F.first(F.when(nonzero, c), ignorenulls=True).over(w_cur) - 1,
            ),
        }
    )

    # Stage 2: horizon at each row = max(A0, prior OUTSIDE clocks in
    # this segment). The lexicographic struct-max picks the max clock
    # within the latest prior segment containing an OUTSIDE; it only
    # applies if that segment is ours (prior segs are <= ours).
    mo = F.max(
        F.when(F.col("_isout"), F.struct(F.col("_seg").alias("s"), c.alias("c")))
    ).over(w_prev)
    s2 = s1.withColumn(
        "_minat",
        F.when(
            mo["s"] == F.col("_seg"), F.greatest(F.col("_a0"), mo["c"])
        ).otherwise(F.col("_a0")),
    )

    # Stage 3: commit decisions for OUTSIDE (emitted iff it commits)
    # and ACK rows (commit vs rollback).
    s3 = s2.withColumns(
        {
            "_ocommit": F.col("_isout") & (c > F.col("_minat")),
            "_acommit": F.col("_isack") & (c > F.col("_minat")),
        }
    )

    # Stage 4: barrier count / last-barrier clock (sub-segment id and
    # its max_clock base).
    bar = F.col("_isack") | F.col("_ocommit")
    s4 = s3.withColumns(
        {
            "_bcnt": F.count(F.when(bar, 1)).over(w_prev),
            "_b0": F.coalesce(
                F.last(F.when(bar, c), ignorenulls=True).over(w_prev),
                F.first(F.when(nonzero, c), ignorenulls=True).over(w_cur) - 1,
            ),
        }
    )

    # Stage 5: did this CONTINUE join the pending run? (clock above
    # the sub-segment's running max_clock; min check subsumed since
    # b0 <= max.)
    mc = F.max(
        F.when(F.col("_iscont"), F.struct(F.col("_bcnt").alias("b"), c.alias("c")))
    ).over(w_prev)
    run_max = F.when(mc["b"] == F.col("_bcnt"), mc["c"])
    s5 = s4.withColumn(
        "_joined",
        F.col("_iscont")
        & (c > F.greatest(F.col("_b0"), F.coalesce(run_max, F.col("_b0")))),
    )

    # Stage 6: closing ACK of this row's segment (the first ACK at a
    # larger offset), with its clock, commit flag, and barrier count.
    nxt = F.last(
        F.when(
            F.col("_isack"),
            F.struct(
                c.alias("c"),
                F.col("_acommit").alias("ok"),
                F.col("_bcnt").alias("b"),
            ),
        ),
        ignorenulls=True,
    ).over(w_rev_prev)
    s6 = s5.withColumn("_nack", nxt)

    cont_emit = (
        F.col("_joined")
        & F.col("_nack").isNotNull()
        & (F.col("_nack")["b"] == F.col("_bcnt"))  # no barrier clobbers us
        & F.col("_nack")["ok"]  # closing ACK commits (not rollback)
        & (c <= F.col("_nack")["c"])  # committed through our clock
    )

    return (
        s6.filter(~nonzero | F.col("_ocommit") | cont_emit)
        .drop(
            "_isack", "_iscont", "_isout", "_seg", "_a0", "_minat",
            "_ocommit", "_acommit", "_bcnt", "_b0", "_joined", "_nack",
        )
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
    drift silently. (The oracle freely uses per-segment window
    partitions where the Spark side uses the struct-max trick to keep
    a single producer-keyed shuffle.)"""
    p, c, fl, off = producer, clock, flags, offset
    return f"""
    WITH _msgs AS ({inner_sql}),
    _s1 AS (
      SELECT _msgs.*,
        ({c} <> 0 AND {fl} = 2) AS _isack,
        ({c} <> 0 AND {fl} = 1) AS _iscont,
        ({c} <> 0 AND {fl} NOT IN (1, 2)) AS _isout,
        COUNT(CASE WHEN {c} <> 0 AND {fl} = 2 THEN 1 END) OVER w_prev AS _seg,
        COALESCE(
          LAST_VALUE(CASE WHEN {c} <> 0 AND {fl} = 2 THEN {c} END IGNORE NULLS)
            OVER w_prev,
          FIRST_VALUE(CASE WHEN {c} <> 0 THEN {c} END IGNORE NULLS)
            OVER w_cur - 1) AS _a0
      FROM _msgs
      WINDOW
        w_prev AS (PARTITION BY {p} ORDER BY {off}
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        w_cur AS (PARTITION BY {p} ORDER BY {off}
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    _s2 AS (
      SELECT *,
        GREATEST(_a0, COALESCE(
          MAX(CASE WHEN _isout THEN {c} END) OVER (
            PARTITION BY {p}, _seg ORDER BY {off}
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
          _a0)) AS _minat
      FROM _s1
    ),
    _s3 AS (
      SELECT *,
        (_isout AND {c} > _minat) AS _ocommit,
        (_isack AND {c} > _minat) AS _acommit
      FROM _s2
    ),
    _s4 AS (
      SELECT *,
        COUNT(CASE WHEN _isack OR _ocommit THEN 1 END) OVER w_prev AS _bcnt,
        COALESCE(
          LAST_VALUE(CASE WHEN _isack OR _ocommit THEN {c} END IGNORE NULLS)
            OVER w_prev,
          FIRST_VALUE(CASE WHEN {c} <> 0 THEN {c} END IGNORE NULLS)
            OVER w_cur - 1) AS _b0
      FROM _s3
      WINDOW
        w_prev AS (PARTITION BY {p} ORDER BY {off}
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        w_cur AS (PARTITION BY {p} ORDER BY {off}
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    _s5 AS (
      SELECT *,
        (_iscont AND {c} > GREATEST(_b0, COALESCE(
          MAX(CASE WHEN _iscont THEN {c} END) OVER (
            PARTITION BY {p}, _bcnt ORDER BY {off}
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
          _b0))) AS _joined
      FROM _s4
    ),
    _s6 AS (
      SELECT *,
        FIRST_VALUE(CASE WHEN _isack THEN {c} END IGNORE NULLS)
          OVER w_next AS _nack_clock,
        FIRST_VALUE(CASE WHEN _isack THEN CAST(_acommit AS INT) END IGNORE NULLS)
          OVER w_next AS _nack_ok,
        FIRST_VALUE(CASE WHEN _isack THEN _bcnt END IGNORE NULLS)
          OVER w_next AS _nack_bcnt
      FROM _s5
      WINDOW w_next AS (PARTITION BY {p} ORDER BY {off}
                        ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
    )
    SELECT {select_cols} FROM _s6
    WHERE {c} = 0 OR _ocommit
       OR (_joined AND _nack_clock IS NOT NULL AND _nack_bcnt = _bcnt
           AND _nack_ok = 1 AND {c} <= _nack_clock)
    """
