"""Publisher → sequencer closure: an uncommitted publish followed by
its ACK intents must be fully released by the read-committed view;
without the ACKs, nothing leaks."""

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from core_spark.functions.uuid import uuid_clock, uuid_flags
from core_spark.operators.sequencer import read_committed
from core_spark.streaming.publisher import ack_intents, publish_uncommitted


def _journal_frames(spark, with_acks: bool):
    data = spark.createDataFrame(
        [(u, i, float(u * 100 + i)) for u in (1, 2) for i in range(25)],
        "producer long, seq long, payload double",
    )
    pub = publish_uncommitted(data, "producer", "seq").withColumn(
        "clock", uuid_clock(F.col("uuid"))
    ).withColumn("flags", uuid_flags(F.col("uuid")))
    frames = pub.select("producer", "clock", "flags", "payload")
    if with_acks:
        acks = ack_intents(pub, "producer").select(
            "producer", "clock", "flags", F.lit(None).cast("double").alias("payload")
        )
        frames = frames.unionByName(acks)
    # journal order: publishes first, ACKs last (commit-then-ack)
    return frames.withColumn(
        "off",
        F.row_number().over(Window.orderBy("flags", "producer", "clock")),
    )


def test_acked_publish_fully_released(spark):
    frames = _journal_frames(spark, with_acks=True)
    out = read_committed(frames, offset="off")
    # all 50 data rows emitted, no ACK rows in the output
    assert out.count() == 50
    assert out.filter(F.col("flags") == 2).count() == 0
    # distinct clocks per producer (the collision regression guard)
    per = frames.filter(F.col("flags") == 1).groupBy("producer").agg(
        F.countDistinct("clock").alias("n")
    )
    assert {r.n for r in per.collect()} == {25}


def test_unacked_publish_stays_pending(spark):
    frames = _journal_frames(spark, with_acks=False)
    assert read_committed(frames, offset="off").count() == 0
