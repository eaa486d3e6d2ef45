"""Declared streaming queries (non-SQL-expressible: stateful streaming
operators — registered without oracles, driver records rows-only)."""

from __future__ import annotations

import os
import tempfile
import uuid as py_uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from core_spark.io import load_table
from core_spark.plans.message import message_view
from core_spark.plans.registry import query
from core_spark.streaming.read_committed import (
    MESSAGE_SCHEMA,
    stream_read_committed,
)


@query("q_stream_dedup", oracle=None)
def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming read-committed view (keyed-state sequencer; see
    core_spark/streaming/read_committed.py for backend selection).

    Feeds the derived message journal (plans/message.py) through the
    stateful streaming operator in 3 offset-ordered micro-batches and
    returns the emitted set. By construction this equals q_dedup's
    batch result — the batch/streaming agreement is asserted in
    tests/test_streaming.py; here the streaming path itself is the
    declared operator (reference: message/sequencer.go Step loop under
    consumer/transaction.go's micro-batch driver).
    """
    events = load_table(spark, sf_dir, "events")
    msgs = message_view(events).select(
        "event_id", "user_id", "value", "off", "producer", "clock", "flags"
    )
    work = tempfile.mkdtemp(prefix="q_stream_dedup_")
    src = os.path.join(work, "src")
    os.makedirs(src)
    # Three offset-ordered chunks cut at approximate terciles — pure
    # DataFrame writes, nothing materializes on the driver (the chunk
    # files themselves stream through executors; only the two cut
    # points come back).
    q1, q2 = msgs.stat.approxQuantile("off", [1 / 3, 2 / 3], 0.001)
    bounds = [(None, int(q1)), (int(q1), int(q2)), (int(q2), None)]
    for i, (lo, hi) in enumerate(bounds):
        chunk = msgs
        if lo is not None:
            chunk = chunk.filter(F.col("off") >= lo)
        if hi is not None:
            chunk = chunk.filter(F.col("off") < hi)
        chunk.coalesce(1).write.parquet(os.path.join(src, f"chunk-{i}.parquet"))

    name = "q_stream_dedup_" + py_uuid.uuid4().hex[:8]
    stream = (
        spark.readStream.schema(MESSAGE_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    # Stateful-op parallelism follows spark.sql.shuffle.partitions; a
    # caller session's default (200) means 200 Python-worker tasks per
    # micro-batch for 20 producers — pin a sane width for this query
    # and restore the caller's setting afterwards.
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "16")
    try:
        q = (
            stream_read_committed(stream)
            .writeStream.format("memory")
            .queryName(name)
            .option("checkpointLocation", os.path.join(work, "ckpt"))
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    return spark.sql(
        f"SELECT event_id, user_id, value, off, producer, clock, flags "
        f"FROM {name} ORDER BY off"
    )
