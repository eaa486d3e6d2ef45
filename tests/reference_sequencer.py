"""Imperative Python reference of the read-committed sequencer.

An independent re-statement of the reference outcome table
(message/sequencer.go:158-341 QueueUncommitted, :344-462 Step):
written as per-producer mutable state — the shape the Go original
uses — so the declarative window formulation and this imperative one
can cross-validate each other on fuzzed interleavings.

Per-producer state is (min_clock, max_clock, pending):
- min_clock is the *exclusive* committed horizon; max_clock the
  largest clock tracked in the current partial sequence.
- A producer's first message initializes both to clock-1
  (sequencer.go:190-198).
- Zero-clock messages pass straight through and never touch state
  (:176-187 — a fresh throwaway partial is used, the indexed one is
  not consulted or updated).
- OUTSIDE_TXN: dropped iff clock <= min_clock (already acked);
  otherwise it commits immediately AND clobbers any pending
  CONTINUE run (:315-325 — "we deliberately clobber it here,
  treating as an effective rollback"), leaving min=max=clock after
  dequeue (Step tightens minClock to each dequeued clock).
- CONTINUE_TXN: dropped iff clock <= min_clock or clock <= max_clock
  (duplicate within the transaction); otherwise appended to pending
  with max_clock = clock.
- ACK_TXN with clock <= min_clock: ROLLBACK — pending is discarded
  and the horizon RESETS DOWNWARD to min=max=clock (:236-257 — an
  earlier ACK means an upstream shard recovered an older checkpoint;
  resetting trades exactly-once for at-least-once rather than risk
  losing upstream messages entirely).
- ACK_TXN with clock > min_clock: COMMIT — pending messages with
  clock <= ack clock are emitted in order, higher-clock pending is
  dropped (:326-328 — "commit through |clock|. Which may be less
  than the maximum clock of the partial sequence!"), and
  min=max=ack clock.

Net effect: *every* ACK and every committed OUTSIDE is a barrier that
leaves the producer at (min=max=barrier clock, no pending); the only
difference between the cases is what gets emitted.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass
class Msg:
    off: int
    producer: int
    clock: int
    flags: int  # 0 OUTSIDE, 1 CONTINUE, 2 ACK
    payload: int = 0


@dataclass
class _ProducerState:
    min_clock: int
    max_clock: int
    pending: list[Msg]


def read_committed_ref(msgs: list[Msg]) -> list[Msg]:
    """Emit the read-committed data messages of one journal."""
    states: dict[int, _ProducerState] = {}
    out: list[Msg] = []
    for m in sorted(msgs, key=lambda x: x.off):
        if m.clock == 0:  # no UUID: passthrough, state untouched
            out.append(m)
            continue
        st = states.get(m.producer)
        if st is None:
            st = states[m.producer] = _ProducerState(m.clock - 1, m.clock - 1, [])
        if m.flags == 0:  # OUTSIDE_TXN
            if m.clock <= st.min_clock:
                continue  # behind the committed horizon
            out.append(m)  # immediate commit; clobbers pending
            st.pending = []
            st.min_clock = st.max_clock = m.clock
        elif m.flags == 1:  # CONTINUE_TXN
            if m.clock <= st.min_clock or m.clock <= st.max_clock:
                continue  # already acked / duplicate within txn
            st.pending.append(m)
            st.max_clock = m.clock
        else:  # ACK_TXN
            if m.clock > st.min_clock:
                for pm in st.pending:
                    if pm.clock <= m.clock:
                        out.append(pm)
            # commit or rollback: pending clears, horizon = ack clock
            # (rollback RESETS DOWNWARD so post-recovery re-sends are
            # not dropped — QueueAckRollback)
            st.pending = []
            st.min_clock = st.max_clock = m.clock
    # pending CONTINUEs with no following ACK are never emitted
    return out
