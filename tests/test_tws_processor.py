"""Drive the transformWithStateInPandas sequencer backend directly.

This container lacks google.protobuf, which Spark's TWS state *server*
needs — but the processor class itself (init / handleInputRows / timer
re-arm / handleExpiredTimer) imports and runs fine. These tests
execute the real TWS code path against a faithful handle double:
ValueState/ListState round-trip, per-batch timer delete+re-register,
idle eviction, and bit-for-bit agreement with the batch sequencer on
the derived message view. Only the protobuf wire plumbing remains
unexercised here (covered on any standard cluster image, where
stream_read_committed auto-selects this backend).

Reference: message/sequencer.go:158-341 outcome table;
consumer/shard.go:35-38 prune horizon.
"""

import pandas as pd
import pytest
from pyspark.sql.streaming.stateful_processor import TimerValues

from core_spark.io import load_table
from core_spark.operators.sequencer import read_committed
from core_spark.plans.message import message_view
from core_spark.streaming.read_committed import _COLS, make_tws_sequencer
from tests.conftest import SF_SMOKE


class FakeValueState:
    def __init__(self):
        self._v = None

    def exists(self):
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)

    def clear(self):
        self._v = None


class FakeListState:
    def __init__(self):
        self._rows = []

    def get(self):
        return iter(list(self._rows))

    def put(self, rows):
        self._rows = [tuple(r) for r in rows]

    def clear(self):
        self._rows = []


class FakeHandle:
    """The subset of StatefulProcessorHandle the sequencer uses."""

    def __init__(self):
        self.states = {}
        self.timers = []

    def getValueState(self, name, schema):
        return self.states.setdefault(name, FakeValueState())

    def getListState(self, name, schema):
        return self.states.setdefault(name, FakeListState())

    def listTimers(self):
        return list(self.timers)

    def deleteTimer(self, t):
        self.timers.remove(t)

    def registerTimer(self, t):
        self.timers.append(t)


def _drive(proc, producer, pdf, now_ms=1_000):
    out = list(
        proc.handleInputRows((producer,), iter([pdf]), TimerValues(now_ms))
    )
    return (
        pd.concat(out, ignore_index=True)
        if out
        else pd.DataFrame(columns=_COLS)
    )


@pytest.fixture(scope="module")
def msgs(spark):
    """The derived message view at sf0.001, as pandas."""
    return (
        message_view(load_table(spark, SF_SMOKE, "events"))
        .toPandas()
        .astype({"value": float})
    )


def test_tws_agrees_with_batch_sequencer_across_batches(spark, msgs):
    """Split each producer's journal into two micro-batches at the
    median offset; the TWS processor's emissions (state carried via
    the handle between calls) must equal the batch read_committed
    output row-for-row."""
    expected = (
        read_committed(
            message_view(load_table(spark, SF_SMOKE, "events")), offset="off"
        )
        .select(*_COLS)
        .toPandas()
    )
    Sequencer = make_tws_sequencer(prune_ms=None)
    got_parts = []
    for producer, grp in msgs.groupby("producer"):
        proc = Sequencer()
        proc.init(FakeHandle())
        grp = grp.sort_values("off")
        cut = grp["off"].median()
        got_parts.append(_drive(proc, producer, grp[grp["off"] <= cut]))
        got_parts.append(_drive(proc, producer, grp[grp["off"] > cut]))
    got = pd.concat(got_parts, ignore_index=True)

    def norm(df):
        return (
            df[_COLS]
            .astype({c: "int64" for c in _COLS if c != "value"})
            .sort_values(["producer", "off"])
            .reset_index(drop=True)
        )

    pd.testing.assert_frame_equal(norm(got), norm(expected))


def test_timer_rearmed_every_batch():
    """With a prune horizon, each handled batch must leave exactly ONE
    timer at now + prune_ms (old timer deleted, new registered)."""
    Sequencer = make_tws_sequencer(prune_ms=60_000)
    proc = Sequencer()
    h = FakeHandle()
    proc.init(h)
    batch = pd.DataFrame(
        [[1, 1, 1.0, 0, 7, 5, 0]], columns=_COLS
    )
    _drive(proc, 7, batch, now_ms=1_000)
    assert h.timers == [61_000]
    batch2 = pd.DataFrame([[2, 1, 1.0, 1, 7, 6, 0]], columns=_COLS)
    _drive(proc, 7, batch2, now_ms=5_000)
    assert h.timers == [65_000]  # re-armed, not accumulated


def test_expired_timer_evicts_then_reinitializes():
    """handleExpiredTimer clears the producer's state (24h horizon
    analog); a producer reappearing afterwards re-initializes from its
    next message — the at-least-once fallback — instead of replaying
    the old horizon."""
    Sequencer = make_tws_sequencer(prune_ms=60_000)
    proc = Sequencer()
    h = FakeHandle()
    proc.init(h)

    # CONTINUE run left pending (no ACK yet): state exists
    run = pd.DataFrame(
        [[1, 1, 1.0, 0, 7, 10, 1], [2, 1, 1.0, 1, 7, 11, 1]], columns=_COLS
    )
    out1 = _drive(proc, 7, run)
    assert len(out1) == 0  # nothing committed yet
    assert h.states["clocks"].exists()
    assert len(list(h.states["pend"].get())) == 2

    # horizon passes: eviction
    assert list(proc.handleExpiredTimer((7,), TimerValues(100_000), None)) == []
    assert not h.states["clocks"].exists()
    assert list(h.states["pend"].get()) == []

    # reappearance: clock 12 CONTINUE then ACK 13 commits ONLY the
    # post-prune run (the pre-prune pending rows are gone — exactly
    # what a recreated reference partialSeq would do)
    out2 = _drive(
        proc,
        7,
        pd.DataFrame(
            [[3, 1, 1.0, 2, 7, 12, 1], [4, 1, 1.0, 3, 7, 13, 2]],
            columns=_COLS,
        ),
    )
    assert sorted(out2["clock"]) == [12]
    assert h.states["clocks"].get() == (13, 13)
