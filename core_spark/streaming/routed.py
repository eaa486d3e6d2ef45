"""Topology-aware publisher: route rows to the journals a WatchedList
currently resolves, re-snapshotting the partition set every trigger.

Reference mapping: examples/bike-share/application.go:208-228
buildMapping — `message.ModuloMapping(fn, parts.List)` reads the
WatchedList's CURRENT snapshot for every message, so a JournalSpec
applied mid-stream (a new topic partition) starts receiving traffic
as soon as the watch observes it. Here the unit of routing is the
micro-batch: `RoutedPublisher.__call__` refreshes the watch, maps
each row's key to one of the resolved journals (modulo or rendezvous,
message/routines.go:80-157), and appends each group to its journal.

100 TB shape: the partition set is topology-sized (tens..thousands of
names, never data-sized); routing is one map-side expression over the
batch, and the per-journal appends are independent fragment writes —
the same per-journal serialization contract the reference's brokers
enforce. The batch persists once so N appends don't recompute the
upstream plan N times. Rendezvous routing is the minimal-churn option
when the set changes: only keys whose highest-random-weight winner
moved re-route (hashing.py:rendezvous_mapping).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from core_spark.catalog import WatchedList
from core_spark.functions.hashing import modulo_mapping, rendezvous_mapping
from core_spark.sources.journal import Journal


class RoutedPublisher:
    """foreachBatch target writing each row to its mapped journal.

    mapping: 'modulo' (stable index over the sorted snapshot) or
    'rendezvous' (highest-random-weight; minimal churn on topology
    change).

    Exactly-once contract (the same one every checkpointed Spark sink
    has): the per-journal `pub:{publisher_id}` batch registers and the
    query's CHECKPOINT DIRECTORY share a lifecycle. Deleting the
    checkpoint resets batch ids to 0 while the registers remember the
    old high-water mark, so early batches of the reborn query would be
    skipped as re-deliveries — if you reset the checkpoint, reset (or
    rename) `publisher_id` with it. For the same reason two CONCURRENT
    queries writing overlapping journals must use distinct
    publisher_ids; sharing one makes each query skip batches the other
    committed."""

    def __init__(
        self,
        root: str,
        watch: WatchedList,
        key_col: str,
        mapping: str = "modulo",
        publisher_id: str = "routed",
    ):
        if mapping not in ("modulo", "rendezvous"):
            raise ValueError(f"unknown mapping {mapping!r}")
        self.root = root
        self.watch = watch
        self.key_col = key_col
        self.mapping = mapping
        self.publisher_id = publisher_id

    def _route_col(self, names: tuple[str, ...]) -> Column:
        key = F.col(self.key_col).cast("string")
        if self.mapping == "rendezvous":
            return rendezvous_mapping(key, list(names))
        idx = modulo_mapping(key, len(names))
        return F.element_at(
            F.array(*[F.lit(n) for n in names]), (idx + 1).cast("int")
        )

    def __call__(self, df: DataFrame, batch_id: int) -> None:
        # Watch cadence = trigger cadence: a spec applied mid-stream
        # is picked up at the next batch (buildMapping reads the
        # watched snapshot per message; per micro-batch is the Spark
        # unit of "per message").
        names = self.watch.refresh()
        if not names:
            raise RuntimeError(
                f"selector resolves no journals (catalog v{self.watch.version})"
            )
        routed = df.withColumn("_route", self._route_col(names)).persist()
        # Per-journal batch register: a foreachBatch retry after a
        # mid-batch crash re-delivers the batch, and without a marker
        # every journal that DID commit would receive its group twice.
        # Each append records `pub:{publisher_id} = batch_id` in the
        # same manifest CAS as the fragment, so the skip below is
        # exactly-once per (journal, batch) — the FencedJournalSink
        # batch-skip pattern applied to the fan-out path. Caveat
        # (same as the reference's live-mapping window): if the
        # TOPOLOGY changes between the failed attempt and the retry,
        # keys may re-route to a journal that hasn't seen the batch,
        # while their original journal keeps the first attempt's copy.
        reg = f"pub:{self.publisher_id}"
        try:
            for name in names:
                j = Journal(self.root, name)
                if int(j.manifest().registers.get(reg, "-1")) >= batch_id:
                    continue  # this journal already committed the batch
                part = routed.filter(F.col("_route") == name).drop("_route")
                if part.limit(1).count():
                    j.append(part, set_registers={reg: str(batch_id)})
        finally:
            routed.unpersist()
