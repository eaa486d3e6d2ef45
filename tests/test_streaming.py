"""Streaming: the stateful read-committed view must agree bit-for-bit
with the batch window formulation across micro-batch boundaries, and
the fenced sink must be exactly-once under batch re-delivery and
zombie writers."""

import os

import pytest
from pyspark.sql import functions as F

from core_spark.io import load_table
from core_spark.operators.sequencer import read_committed
from core_spark.plans.message import message_view
from core_spark.sources.journal import Journal, RegisterMismatch
from core_spark.streaming.read_committed import (
    MESSAGE_SCHEMA,
    stream_read_committed,
)
from core_spark.streaming.sink import FencedJournalSink
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def messages(spark):
    events = load_table(spark, SF_SMOKE, "events")
    return message_view(events).select(
        "event_id", "user_id", "value", "off", "producer", "clock", "flags"
    )


def test_stream_matches_batch(spark, messages, tmp_path):
    """Feed the derived journal in 3 offset-ordered chunks (one file
    per micro-batch); final emitted set == batch read_committed."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    ordered = messages.orderBy("off").collect()
    cuts = [len(ordered) // 3, 2 * len(ordered) // 3, len(ordered)]
    lo = 0
    for i, hi in enumerate(cuts):
        spark.createDataFrame(ordered[lo:hi], schema=MESSAGE_SCHEMA).coalesce(
            1
        ).write.parquet(os.path.join(src, f"chunk-{i}.parquet"))
        lo = hi

    stream = (
        spark.readStream.schema(MESSAGE_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    q = (
        stream_read_committed(stream)
        .writeStream.format("memory")
        .queryName("rc_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        (r.off, r.event_id)
        for r in spark.sql("SELECT off, event_id FROM rc_out").collect()
    }
    want = {
        (r.off, r.event_id)
        for r in read_committed(messages, offset="off")
        .select("off", "event_id")
        .collect()
    }
    assert got == want and len(got) > 0


@pytest.mark.slow
def test_stream_prune_horizon_evicts_idle_state(spark, tmp_path):
    """A producer idle past idle_prune_ms has its state evicted (the
    24h messageSequencerPruneHorizon analog, consumer/shard.go:35-38):
    a message redelivered AFTER the prune re-initializes and is
    re-emitted (at-least-once across the horizon), where a live state
    would have dropped it as behind the committed horizon."""
    import time

    src = str(tmp_path / "src")
    os.makedirs(src)

    def write_chunk(i, rows):
        spark.createDataFrame(rows, MESSAGE_SCHEMA).coalesce(1).write.parquet(
            os.path.join(src, f"chunk-{i}.parquet")
        )

    def poll(expected_offs, deadline_s=60):
        """With processing-time timeouts the engine runs continuous
        micro-batches, so processAllAvailable never idles — poll the
        memory sink instead."""
        end = time.time() + deadline_s
        while time.time() < end:
            got = sorted(
                r.off
                for r in spark.sql(
                    "SELECT off FROM rc_prune WHERE producer = 7"
                ).collect()
            )
            if got == expected_offs:
                return got
            time.sleep(0.5)
        return sorted(
            r.off
            for r in spark.sql(
                "SELECT off FROM rc_prune WHERE producer = 7"
            ).collect()
        )

    # batch 1: producer 7 commits OUTSIDE clock 10
    write_chunk(0, [(1, 1, 1.0, 10, 7, 10, 0)])
    stream = (
        spark.readStream.schema(MESSAGE_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    q = (
        stream_read_committed(stream, idle_prune_ms=700)
        .writeStream.format("memory")
        .queryName("rc_prune")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .start()
    )
    try:
        assert poll([10]) == [10]
        time.sleep(2.0)  # idle horizon passes; a timer batch evicts state
        # redelivery of producer 7's message post-prune: re-emitted
        # (a live state would drop it as behind the committed horizon)
        write_chunk(1, [(1, 1, 1.0, 11, 7, 10, 0)])
        got = poll([10, 11])
    finally:
        q.stop()
    # both deliveries emitted: state was evicted between them
    assert got == [10, 11]


def test_fenced_sink_exactly_once(spark, tmp_path):
    root = str(tmp_path / "journals")
    sink = FencedJournalSink(root, "out/results", shard="shard-0")
    batch = spark.range(0, 100).withColumnRenamed("id", "v")

    sink(batch, 0)
    sink(batch, 0)  # re-delivery of the same epoch: must be a no-op
    sink(batch, 1)

    j = Journal(root, "out/results")
    df = j.read(spark)
    assert df.count() == 200  # two distinct batches, no duplicates
    assert df.filter(F.col("_batch") == 0).count() == 100
    assert sorted(
        int(f[6:-5]) for f in os.listdir(os.path.join(j.root, "_acks"))
    ) == [0, 1]


def test_fenced_sink_rejects_zombie(spark, tmp_path):
    root = str(tmp_path / "journals")
    old = FencedJournalSink(root, "out/results", shard="shard-0")
    batch = spark.range(0, 10).withColumnRenamed("id", "v")
    old(batch, 0)

    new = FencedJournalSink(root, "out/results", shard="shard-0")
    # fences are store-assigned and unique: the new incarnation's is
    # strictly larger (constructor CAS increments fence:{shard})
    assert new.fence > old.fence
    new(batch, 1)

    # the zombie's next write must be fenced off...
    with pytest.raises(RegisterMismatch):
        old(batch, 2)
    # ...and so is its ACK re-send of an already-committed batch
    ack = os.path.join(Journal(root, "out/results").root, "_acks/batch-0.json")
    os.remove(ack)
    with pytest.raises(RegisterMismatch):
        old(batch, 0)
    assert not os.path.exists(ack)  # the zombie wrote nothing
    new(batch, 0)  # the live incarnation re-sends the recovered ACK
    assert os.path.exists(ack)
