"""Shard runner: the consumer-transaction loop as a streaming query.

Reference mapping (SURVEY.md §2.7, §3.3):
- ShardSpec {sources, txn min/max duration, state location}
  (consumer/protocol/protocol.proto:55-233) → ShardConfig below.
- runTransactions' pipelined dynamic micro-batches
  (consumer/transaction.go:22-113) → Structured Streaming micro-batch
  driver with a processing-time trigger (max_txn_duration analog).
- ConsumeMessage/FinalizeTxn app hooks (consumer/interfaces.go:232-276)
  → the `transform` callable (per-batch DataFrame → DataFrame);
  stateful apps use stream_read_committed / their own
  applyInPandasWithState upstream of the sink.
- Checkpoint restore → Spark streaming checkpoint + the sink's
  committed-batch watermark (restart-safe, tested).
- Commit barrier + ACK fan-out → FencedJournalSink.

The source is a journal directory tailed as a file stream — the
"blocking read at the write head" (broker/read_api.go) is the trigger
loop; `maxFilesPerTrigger` is the read-pump admission control
(consumer/shard.go:21-38 channel bounds).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from core_spark.streaming.sink import FencedJournalSink


@dataclass
class ShardConfig:
    source_glob: str | None  # journal fragment glob to tail, OR...
    source_schema: str | None
    out_root: str
    out_journal: str
    shard_id: str
    checkpoint_dir: str
    max_files_per_trigger: int = 8
    trigger_seconds: float | None = None  # None => availableNow semantics
    # ...a journal tailed through its own manifest via the journal
    # data source (sources/datasource.py) — the MessageProducer
    # override path; offsets/progress are journal offsets.
    source_root: str | None = None
    source_journal: str | None = None
    # Fragment format each transaction commits (parquet/orc, or the
    # byte-stream codec containers jsonl.zst/.xz/.gz — gazette
    # consumers append compressed byte streams, and the codec suffix
    # rides the fragment name; sources/codec_fragments.py).
    out_fmt: str = "parquet"


def run_shard(
    spark: SparkSession,
    cfg: ShardConfig,
    transform: Callable[[DataFrame], DataFrame],
) -> StreamingQuery:
    """Start the shard's streaming query; returns the handle
    (caller awaits/stops — the Resolver analog owns lifecycle)."""
    if cfg.source_journal is not None:
        from core_spark.sources.datasource import journal_datasource

        spark.dataSource.register(journal_datasource())
        src = (
            spark.readStream.format("journal")
            .option("root", cfg.source_root)
            .option("name", cfg.source_journal)
            .load()
        )
    else:
        src = (
            spark.readStream.schema(cfg.source_schema)
            .option("maxFilesPerTrigger", cfg.max_files_per_trigger)
            .parquet(cfg.source_glob)
        )
    # fence is store-assigned at construction: each incarnation of the
    # shard gets a unique, larger fence via the journal's manifest CAS
    sink = FencedJournalSink(
        cfg.out_root, cfg.out_journal, shard=cfg.shard_id, fmt=cfg.out_fmt
    )

    def process(df: DataFrame, batch_id: int) -> None:
        # Offset-granular progress (Stat RPC's ReadThrough): when the
        # source is a journal, the batch rows carry their source
        # `_offset`. The max rides the sink's own write job as an
        # Observation metric — an eager df.agg(...).first() here would
        # re-read the batch's fragments, doubling source I/O on every
        # trigger (review finding r4). The resolved offset commits in
        # the same manifest CAS as the batch (post_write_registers).
        rt_fn = None
        if cfg.source_journal is not None and "_offset" in df.columns:
            from pyspark.sql import Observation
            from pyspark.sql import functions as F

            obs = Observation()
            raw = df
            df = df.observe(obs, F.max("_offset").alias("mx"))

            def rt_fn():
                # Non-blocking probe first: a transform is allowed to
                # return a DataFrame NOT derived from its input (e.g. a
                # toPandas round-trip), in which case the sink's write
                # never executes the observed plan and a bare obs.get
                # would deadlock the micro-batch. The fallback pays the
                # one extra scan the observation normally avoids.
                if obs._jo.getRowOrEmpty().isEmpty():
                    mx = raw.agg(F.max("_offset")).first()[0]
                else:
                    mx = obs.get["mx"]
                if mx is None:
                    return {}
                return {cfg.source_journal: int(mx) + 1}

        sink(transform(df), batch_id, read_through_fn=rt_fn)

    writer = (
        src.writeStream.foreachBatch(process)
        .option("checkpointLocation", cfg.checkpoint_dir)
        .outputMode("update")
    )
    if cfg.trigger_seconds is not None:
        writer = writer.trigger(processingTime=f"{cfg.trigger_seconds} seconds")
    else:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def await_offset(
    out_root: str,
    out_journal: str,
    shard_id: str,
    journal: str,
    offset: int,
    timeout: float = 30.0,
    poll: float = 0.05,
) -> int:
    """Offset-granular read-through barrier: block until `shard_id`'s
    COMMITTED progress covers source `journal` through `offset`
    (exclusive end), then return the committed read-through.

    This is the Stat RPC with ReadThrough offsets
    (consumer/shard_api.go:24-51, gating consumer/resolver.go:101-285):
    append → await_offset(r.end) → query the materialization and the
    row is guaranteed visible, because the read-through register
    commits in the same manifest CAS as the batch's data. Raises
    TimeoutError (with the stalled offsets) if the shard does not
    catch up — the resolver's deadline behavior."""
    import time as _time

    from core_spark.sources.journal import Journal

    j = Journal(out_root, out_journal)
    deadline = _time.monotonic() + timeout
    while True:
        rt = int(j.manifest().registers.get(f"rt:{shard_id}:{journal}", "0"))
        if rt >= offset:
            return rt
        if _time.monotonic() > deadline:
            raise TimeoutError(
                f"shard {shard_id}: read-through {rt} < {offset} for "
                f"{journal} after {timeout}s"
            )
        _time.sleep(poll)
