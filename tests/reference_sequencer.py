"""Imperative Python reference of the read-committed sequencer.

An independent re-statement of the semantics documented in
core_spark/operators/sequencer.py (after message/sequencer.go:158-341's
outcome table): written as per-producer mutable state — the shape the
Go original uses — so the declarative window formulation and this
imperative one can cross-validate each other on fuzzed interleavings.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class Msg:
    off: int
    producer: int
    clock: int
    flags: int  # 0 OUTSIDE, 1 CONTINUE, 2 ACK
    payload: int = 0


@dataclass
class _ProducerState:
    seen: set[int] = field(default_factory=set)
    last_ack: int | None = None
    pending: list[Msg] = field(default_factory=list)


def read_committed_ref(msgs: list[Msg]) -> list[Msg]:
    """Emit the read-committed data messages of one journal."""
    states: dict[int, _ProducerState] = {}
    out: list[Msg] = []
    for m in sorted(msgs, key=lambda x: x.off):
        st = states.setdefault(m.producer, _ProducerState())
        if m.clock == 0:  # no UUID: passthrough (zero-clock rule)
            out.append(m)
            continue
        if m.flags == 2:  # ACK barrier: commit <=, roll back >
            for pm in st.pending:
                if pm.clock <= m.clock:
                    out.append(pm)
            st.pending = []
            st.last_ack = (
                m.clock if st.last_ack is None else max(st.last_ack, m.clock)
            )
            continue
        if m.clock in st.seen:  # duplicate delivery
            continue
        st.seen.add(m.clock)
        if st.last_ack is not None and m.clock <= st.last_ack:
            continue  # behind the committed horizon
        if m.flags == 0:
            out.append(m)
        else:
            st.pending.append(m)
    # pending CONTINUEs with no following ACK are never emitted
    return out
