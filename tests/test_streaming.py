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


def test_fenced_sink_exactly_once(spark, tmp_path):
    root = str(tmp_path / "journals")
    sink = FencedJournalSink(root, "out/results", shard="shard-0", fence=1)
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
    old = FencedJournalSink(root, "out/results", shard="shard-0", fence=1)
    batch = spark.range(0, 10).withColumnRenamed("id", "v")
    old(batch, 0)

    new = FencedJournalSink(root, "out/results", shard="shard-0", fence=2)
    new(batch, 1)

    # the zombie's next write must be fenced off
    with pytest.raises(RegisterMismatch):
        old(batch, 2)
    # and a stale *instantiation* is refused outright
    with pytest.raises(RegisterMismatch):
        FencedJournalSink(root, "out/results", shard="shard-0", fence=2)
