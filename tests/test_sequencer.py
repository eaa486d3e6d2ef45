"""Triangle cross-validation of the sequencer: fuzzed message
interleavings run through (a) the imperative Python reference,
(b) the Spark window formulation, (c) the DuckDB oracle SQL — all
three must emit the identical read-committed set.

Cases cover every outcome of message/sequencer.go's table: duplicate
delivery (before and after the ACK), interleaved producers, committed
and rolled-back CONTINUE runs, ACK-without-CONTINUE, duplicate ACKs,
zero-UUID passthrough, and unacked tails.
"""

from __future__ import annotations

import random

import duckdb
import pytest

from core_spark.operators.sequencer import duck_read_committed, read_committed
from tests.reference_sequencer import Msg, read_committed_ref


def _random_case(rng: random.Random, case_id: int) -> list[Msg]:
    msgs: list[Msg] = []
    n_producers = rng.randint(1, 3)
    clock_by_producer = {p: 1 for p in range(n_producers)}
    for _ in range(rng.randint(5, 40)):
        p = rng.randrange(n_producers)
        roll = rng.random()
        if roll < 0.08:
            flags, clock = 0, 0  # zero-UUID
        else:
            flags = rng.choices([0, 1, 2], weights=[4, 4, 2])[0]
            if flags == 2 and rng.random() < 0.3:
                # rollback ACK: clock below the producer's current head
                clock = max(1, clock_by_producer[p] - rng.randint(1, 5))
            else:
                clock_by_producer[p] += rng.randint(1, 3)
                clock = clock_by_producer[p]
        msgs.append(Msg(off=0, producer=case_id * 100 + p, clock=clock, flags=flags))
    # duplicate ~20% of messages (redelivery)
    for m in list(msgs):
        if rng.random() < 0.2:
            msgs.append(Msg(off=0, producer=m.producer, clock=m.clock, flags=m.flags))
    rng.shuffle(msgs)
    for i, m in enumerate(msgs):
        m.off = case_id * 10_000 + i
        m.payload = m.off
    return msgs


def _directed_cases() -> list[list[Msg]]:
    """Hand-written outcome-table cases (offsets assigned positionally)."""
    def seq(case_id: int, rows: list[tuple[int, int, int]]) -> list[Msg]:
        return [
            Msg(off=case_id * 10_000 + i, producer=case_id * 100 + p, clock=c, flags=f)
            for i, (p, c, f) in enumerate(rows)
        ]

    return [
        # commit: CONTINUE run closed by ACK with equal clock
        seq(1000, [(0, 1, 1), (0, 2, 1), (0, 3, 2)]),
        # rollback: ACK with earlier clock discards the run
        seq(1001, [(0, 5, 1), (0, 6, 1), (0, 2, 2)]),
        # duplicate OUTSIDE before and after emission
        seq(1002, [(0, 1, 0), (0, 1, 0), (0, 2, 0), (0, 2, 0)]),
        # ACK without any CONTINUE (QueueAckEmpty)
        seq(1003, [(0, 3, 2), (0, 4, 0)]),
        # late replay behind the committed horizon
        seq(1004, [(0, 5, 1), (0, 6, 2), (0, 4, 0), (0, 7, 0)]),
        # unacked tail never emits
        seq(1005, [(0, 1, 0), (0, 2, 1), (0, 3, 1)]),
        # zero-UUID passthrough incl. duplicates
        seq(1006, [(0, 0, 0), (0, 0, 0), (0, 1, 0)]),
        # duplicate ACKs; CONTINUE between equal-clock ACKs rolls back
        seq(1007, [(0, 3, 1), (0, 5, 2), (0, 7, 1), (0, 5, 2), (0, 9, 2)]),
        # recovery replay: rollback ACK RESETS the horizon DOWNWARD so
        # post-recovery re-sends are accepted (QueueAckRollback,
        # sequencer.go:236-257) — emits 10 AND 8
        seq(1008, [(0, 10, 1), (0, 10, 2), (0, 6, 2), (0, 8, 1), (0, 8, 2)]),
        # at-least-once fallback: the SAME message re-sent after a
        # rollback below its clock is emitted twice
        seq(1009, [(0, 5, 1), (0, 5, 2), (0, 2, 2), (0, 5, 1), (0, 5, 2)]),
        # committed OUTSIDE clobbers the pending CONTINUE run
        # (sequencer.go:315-325) — emits OUT 5 and CONT 7, not CONT 10
        seq(1010, [(0, 10, 1), (0, 5, 0), (0, 7, 1), (0, 7, 2)]),
        # OUTSIDE accepted after a rollback lowered the horizon
        seq(1011, [(0, 9, 0), (0, 3, 2), (0, 5, 0)]),
        # ACK commits THROUGH its clock: higher-clock pending dropped
        # (sequencer.go:326-328) — emits 3 only
        seq(1012, [(0, 3, 1), (0, 5, 1), (0, 4, 2)]),
        # rollback, then a fresh run from below the old horizon
        seq(1013, [(0, 4, 1), (0, 2, 2), (0, 3, 1), (0, 3, 2)]),
    ]


@pytest.fixture(scope="module")
def cases() -> list[Msg]:
    rng = random.Random(42)
    msgs: list[Msg] = []
    for case_id in range(40):
        msgs.extend(_random_case(rng, case_id))
    for case in _directed_cases():
        msgs.extend(case)
    return msgs


def _expected(msgs: list[Msg]) -> set[int]:
    return {m.off for m in read_committed_ref(msgs)}


def test_spark_matches_reference(spark, cases):
    df = spark.createDataFrame(
        [(m.off, m.producer, m.clock, m.flags) for m in cases],
        "off long, producer long, clock long, flags int",
    )
    got = {
        r.off
        for r in read_committed(df, offset="off").select("off").collect()
    }
    assert got == _expected(cases)


def test_duckdb_oracle_matches_reference(cases):
    con = duckdb.connect()
    con.execute("CREATE TABLE msgs(off BIGINT, producer BIGINT, clock BIGINT, flags INT)")
    con.executemany(
        "INSERT INTO msgs VALUES (?, ?, ?, ?)",
        [(m.off, m.producer, m.clock, m.flags) for m in cases],
    )
    sql = duck_read_committed(
        "SELECT * FROM msgs", offset="off", select_cols="off"
    )
    got = {r[0] for r in con.execute(sql).fetchall()}
    assert got == _expected(cases)
