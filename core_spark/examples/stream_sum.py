"""stream-sum: the self-verifying exactly-once pipeline.

Reference: examples/stream-sum — a chunker emits N streams of chunks;
a summer folds each stream's chunks in order into a rolling digest and
emits the final Sum at stream end; the verifier fails the run if any
stream's sum is wrong or missing (stream_sum.go:16-20,97-110,389-470).
It is "a sneaky integration test" of exactly-once delivery.

Engine form: chunks are published CONTINUE_TXN with per-stream ACKs
(publisher), delivered through the read-committed sequencer, folded
per stream with an order-sensitive rolling checksum, and verified
against locally-computed expectations. Any duplicate, loss, or
reorder changes a checksum and fails `verify`.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from core_spark.operators.sequencer import read_committed

CHECKSUM_P = 2_147_483_647


def make_chunks(
    spark: SparkSession, n_streams: int = 8, n_chunks: int = 100
) -> DataFrame:
    """Deterministic chunker (stream_sum.go:342-388): interleaved
    streams of sequenced chunks; payload derived from (stream, seq)."""
    return (
        spark.range(n_streams * n_chunks)
        .select(
            (F.col("id") % n_streams).alias("stream"),
            (F.col("id") / n_streams).cast("long").alias("seq"),
        )
        .withColumn(
            "data",
            F.conv(F.substring(F.md5(F.concat_ws(":", "stream", "seq")), 1, 8), 16, 10)
            .cast("bigint"),
        )
    )


def rolling_sum(chunks: DataFrame) -> DataFrame:
    """Per-stream order-sensitive fold → final Sum per stream
    (Sum.Update's chained digest, stream_sum.go:97-110; the chain here
    is a position-weighted checksum — order-sensitive, so loss,
    duplication, or reorder is detected just the same)."""
    w = W.partitionBy("stream").orderBy("seq")
    seq = chunks.withColumn("i", F.row_number().over(w))
    return seq.groupBy("stream").agg(
        F.count("*").alias("n_chunks"),
        (
            F.sum(F.col("data") % CHECKSUM_P * ((F.col("i") * 2654435761) % 1000003))
            % CHECKSUM_P
        )
        .cast("bigint")
        .alias("sum"),
    )


def expected_sums(n_streams: int, n_chunks: int) -> dict[int, tuple[int, int]]:
    """Driver-side expectation (the verifier's ledger)."""
    out: dict[int, tuple[int, int]] = {}
    for stream in range(n_streams):
        acc = 0
        for i in range(1, n_chunks + 1):
            seq = i - 1
            h = int(hashlib.md5(f"{stream}:{seq}".encode()).hexdigest()[:8], 16)
            acc = (acc + (h % CHECKSUM_P) * ((i * 2654435761) % 1000003)) % CHECKSUM_P
        out[stream] = (n_chunks, acc)
    return out


def run_and_verify(
    spark: SparkSession,
    n_streams: int = 8,
    n_chunks: int = 100,
    with_duplicates: bool = True,
) -> None:
    """End-to-end: publish (optionally with at-least-once duplicate
    delivery) → read-committed → fold → verify exact sums. Raises
    AssertionError on any loss/duplication (stream_sum.go:389-470's
    fatal)."""
    chunks = make_chunks(spark, n_streams, n_chunks)
    # journal frames: CONTINUE per chunk, one trailing ACK per stream
    msgs = chunks.select(
        F.col("stream").alias("producer"),
        (F.col("seq") + 1).alias("clock"),
        F.lit(1).alias("flags"),
        "stream",
        "seq",
        "data",
    )
    acks = msgs.groupBy("producer").agg(F.max("clock").alias("clock")).select(
        "producer", "clock", F.lit(2).alias("flags"),
        F.lit(None).cast("long").alias("stream"),
        F.lit(None).cast("long").alias("seq"),
        F.lit(None).cast("long").alias("data"),
    )
    frames = msgs.unionByName(acks)
    if with_duplicates:  # at-least-once redelivery of every 7th chunk
        frames = frames.unionByName(msgs.filter(F.col("seq") % 7 == 0))
    # Global row_number = single-partition window — fine ONLY because
    # this is the demo's synthetic journal (n_streams*n_chunks rows by
    # construction). A real ingest derives offsets from the journal
    # itself (Journal.append stamps them); see q_dedup for the
    # production formulation where offsets arrive with the data.
    ordered = frames.withColumn(
        "off",
        F.row_number().over(W.orderBy("flags", "producer", "clock")),
    )
    committed = read_committed(ordered, offset="off").select(
        "stream", "seq", "data"
    )
    got = {
        r.stream: (r.n_chunks, r.sum) for r in rolling_sum(committed).collect()
    }
    want = expected_sums(n_streams, n_chunks)
    assert got == want, f"stream-sum verification FAILED: {got} != {want}"
