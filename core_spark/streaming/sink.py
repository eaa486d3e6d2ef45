"""Exactly-once sink protocol: fenced, idempotent-by-batch commits
with post-commit ACK intents.

Reference mapping (SURVEY.md §4.3.2-3):
- The consumer transaction commits {state + checkpoint + staged ACK
  intents} atomically in its store, then appends the ACKs
  (consumer/transaction.go:436-505, message/publisher.go:114-188).
- The remote-SQL store pattern is a `gazette_checkpoints(shard, fence,
  checkpoint)` row updated with a fence-increment CAS
  (consumer/store_sql.go:12-146).

Spark shape: `foreachBatch(sink)` — the micro-batch id is the
transaction id. The sink:
  1. skips batch ids at or below the committed watermark (idempotent
     re-delivery after restart — Spark may re-run the last batch);
  2. writes the batch's data fragments to the output journal;
  3. commits {batch_id} via the journal's manifest CAS, carrying the
     shard fence in the journal registers — a zombie writer holding a
     stale fence loses the CAS and aborts (write fence,
     consumer/recoverylog/fsm.go:41-56);
  4. after the commit, appends one ACK_TXN marker per touched journal
     (BuildAckIntents) so downstream read-committed consumers release
     the batch's CONTINUE run.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from core_spark.sources.journal import Journal, RegisterMismatch


class FencedJournalSink:
    """foreachBatch target writing exactly-once into a Journal."""

    def __init__(self, root: str, journal: str, shard: str, fence: int):
        self.journal = Journal(root, journal)
        self.shard = shard
        self.fence = fence
        # Claim the fence: newer incarnations bump it; older writers
        # then fail their register check (at-most-once appender).
        m = self.journal.manifest()
        held = int(m.registers.get(f"fence:{shard}", "-1"))
        if held >= fence:
            raise RegisterMismatch(
                f"fence {fence} stale: shard {shard} already at {held}"
            )

    def committed_batch(self) -> int:
        m = self.journal.manifest()
        return int(m.registers.get(f"batch:{self.shard}", "-1"))

    def _ensure_ack(self, batch_id: int) -> None:
        """Write the batch's ACK intent if absent. Called on the commit
        path AND on re-delivery: a crash between commit and ACK must
        re-send the ACK when the batch is re-delivered (the recovered
        checkpoint's AckIntents are re-appended at startup,
        consumer/transaction.go:45-91 — idempotent because keyed by
        batch id)."""
        ack_path = os.path.join(self.journal.root, f"_acks/batch-{batch_id}.json")
        if os.path.exists(ack_path):
            return
        os.makedirs(os.path.dirname(ack_path), exist_ok=True)
        with open(ack_path, "w") as fh:
            json.dump(
                {"shard": self.shard, "batch": batch_id, "flags": "ACK_TXN"}, fh
            )

    def __call__(self, df: DataFrame, batch_id: int) -> None:
        if batch_id <= self.committed_batch():
            self._ensure_ack(batch_id)  # ACK re-send after crash-between
            return  # idempotent re-delivery

        m = self.journal.manifest()
        check = {}
        prev_fence = m.registers.get(f"fence:{self.shard}")
        if prev_fence is not None:
            if int(prev_fence) > self.fence:
                raise RegisterMismatch(
                    f"fenced off: journal holds {prev_fence} > {self.fence}"
                )
            check[f"fence:{self.shard}"] = prev_fence

        staged = df.withColumn("_batch", F.lit(batch_id))
        self.journal.append(
            staged,
            check_registers=check,
            set_registers={
                f"fence:{self.shard}": str(self.fence),
                f"batch:{self.shard}": str(batch_id),
            },
        )
        # Post-commit ACK intent (idempotent: keyed by batch id).
        self._ensure_ack(batch_id)
