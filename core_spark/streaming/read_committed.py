"""Streaming read-committed view — the sequencer as keyed state.

This is the `transformWithState`-family port of the batch window
formulation (core_spark.operators.sequencer): state per producer is
exactly the reference's ProducerState checkpoint entry —
{last_ack, seen-clock horizon, pending run}
(consumer/protocol/protocol.proto:294-304, message/sequencer.go:497-537)
— carried across micro-batches by Spark's state store, which plays the
role of Gazette's sequencer ring + replay (sequencer.go:26-37: ring
insufficient → replay; here: state is durable, no replay needed).

Pruning: `seen` clocks older than `prune_horizon` behind the
producer's max clock are dropped each batch — the 24h
messageSequencerPruneHorizon analog (consumer/shard.go:35-38).

Implementation: `applyInPandasWithState` keyed by producer. Arrow
batches in/out; per-key state is a few scalars + bounded arrays. The
shuffle is on producer — identical partitioning to the batch
formulation, so a journal's streaming and batch dedup agree bit-for-bit
(asserted in tests/test_streaming.py).

Within-batch and cross-batch delivery must be offset-ordered per
producer (journal reads are; the file-stream source preserves fragment
order).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# Message schema this operator consumes/emits (the message_view shape).
MESSAGE_SCHEMA = (
    "event_id long, user_id long, value double, off long, "
    "producer long, clock long, flags long"
)
STATE_SCHEMA = (
    "last_ack long, max_clock long, seen array<long>, "
    "pend_off array<long>, pend_clock array<long>, "
    "pend_event array<long>, pend_user array<long>, pend_value array<double>"
)

FLAG_OUTSIDE, FLAG_CONTINUE, FLAG_ACK = 0, 1, 2


def stream_read_committed(
    messages: DataFrame, prune_horizon: int = 1_000_000_000
) -> DataFrame:
    """Read-committed view of a streaming DataFrame in the
    message_view shape. Keyed state per producer; append output.

    The state function is a self-contained closure (only pandas +
    stdlib) so cloudpickle ships it by value — Python workers never
    need core_spark importable, which keeps the operator usable from
    any caller session (the driver harness runs from outside the
    repo).
    """

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        producer = key[0]
        if state.exists:
            last_ack, max_clock, seen, po, pc, pe, pu, pv = state.get
            seen = set(seen)
            pending = [list(t) for t in zip(po, pc, pe, pu, pv)]
        else:
            last_ack, max_clock, seen, pending = -1, 0, set(), []

        out_rows: list[list[Any]] = []

        def emit(off, clock, flags, ev, us, val):
            out_rows.append([ev, us, val, off, producer, clock, flags])

        for pdf in pdfs:
            pdf = pdf.sort_values("off")
            for r in pdf.itertuples(index=False):
                clock, flags = int(r.clock), int(r.flags)
                if clock == 0:  # zero-UUID passthrough
                    emit(int(r.off), clock, flags, int(r.event_id),
                         int(r.user_id), float(r.value))
                    continue
                max_clock = max(max_clock, clock)
                if flags == 2:  # ACK: commit <=, roll back >
                    for off, c, ev, us, val in pending:
                        if c <= clock:
                            emit(off, c, 1, ev, us, val)
                    pending = []
                    last_ack = max(last_ack, clock)
                    continue
                if clock in seen:
                    continue  # duplicate delivery
                seen.add(clock)
                if clock <= last_ack:
                    continue  # behind committed horizon
                if flags == 0:
                    emit(int(r.off), clock, flags, int(r.event_id),
                         int(r.user_id), float(r.value))
                else:
                    pending.append(
                        [int(r.off), clock, int(r.event_id), int(r.user_id),
                         float(r.value)]
                    )

        # prune the seen-set horizon (the 24h analog, in clock units)
        horizon = max_clock - prune_horizon
        seen = {c for c in seen if c >= horizon}

        state.update(
            (
                last_ack,
                max_clock,
                sorted(seen),
                [p[0] for p in pending],
                [p[1] for p in pending],
                [p[2] for p in pending],
                [p[3] for p in pending],
                [p[4] for p in pending],
            )
        )
        if out_rows:
            yield _pd.DataFrame(
                out_rows,
                columns=["event_id", "user_id", "value", "off", "producer",
                         "clock", "flags"],
            )

    return messages.groupBy("producer").applyInPandasWithState(
        fn,
        outputStructType=MESSAGE_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
