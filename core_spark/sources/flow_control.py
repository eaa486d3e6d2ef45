"""Append-path flow control — broker/append_flow_control.go:11-43.

The reference polices two rates on the append pipeline: a per-journal
`max_append_rate` (JournalSpec, protocol.proto) throttling writers,
and a global MinAppendRate that cuts slow CLIENTS whose half-open
append streams would hold the exclusively-owned pipeline hostage. In
this engine an append is one atomic fragment write — nothing is held
locked while a client dribbles bytes; the manifest CAS serializes
only the commit instant — so the slow-client cut has no surface and
only the max-rate policy applies (read-side flow control lives in the
gateway's paged GET).

Shape: a token bucket over bytes with the reference's knobs — one
second of initial burst credit (flowControlBurstFactor) and a 10x
bank of unused credit for spiky workloads (flowControlBankFactor).
Buckets are shared per journal path within the process: the engine's
append path is single-writer-serialized per journal (the same
contract the broker's pipeline enforces), so in-process sharing IS
the enforcement point; a multi-writer deployment fronts appends with
the gateway, which funnels through the same bucket.
"""

from __future__ import annotations

import threading
import time
from collections.abc import Callable

_BURST_SECONDS = 1.0  # flowControlBurstFactor
_BANK_FACTOR = 10.0  # flowControlBankFactor


class TokenBucket:
    """Byte-rate shaper: `throttle(n)` debits n bytes and sleeps off
    any debt so the long-run rate converges to `rate` bytes/second.
    Clock and sleep are injectable for deterministic tests."""

    def __init__(
        self,
        rate: float,
        clock: Callable[[], float] = time.monotonic,
        sleep: Callable[[float], None] = time.sleep,
    ):
        if rate <= 0:
            raise ValueError(f"rate must be positive, got {rate}")
        self.rate = float(rate)
        self.capacity = self.rate * _BANK_FACTOR
        self.tokens = self.rate * _BURST_SECONDS
        self._clock = clock
        self._sleep = sleep
        self._last = clock()
        self._lock = threading.Lock()

    def throttle(self, n_bytes: int) -> float:
        """Debit `n_bytes`; sleep until the balance is non-negative.
        Returns seconds slept."""
        with self._lock:
            now = self._clock()
            self.tokens = min(
                self.capacity, self.tokens + (now - self._last) * self.rate
            )
            self._last = now
            self.tokens -= n_bytes
            wait = max(0.0, -self.tokens / self.rate)
            if wait:
                # hold the lock: concurrent appenders to one journal
                # queue behind the debt, which is the policy
                self._sleep(wait)
                self.tokens += wait * self.rate
                self._last = self._clock()
            return wait


_buckets: dict[str, TokenBucket] = {}
_buckets_lock = threading.Lock()


def bucket_for(journal_path: str, rate: int) -> TokenBucket:
    """Process-shared bucket for a journal; re-created when the
    spec's rate changes (a JournalSpec update takes effect on the
    next append)."""
    with _buckets_lock:
        b = _buckets.get(journal_path)
        if b is None or b.rate != float(rate):
            b = TokenBucket(rate)
            _buckets[journal_path] = b
        return b
