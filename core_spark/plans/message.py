"""Message-layer declared queries: shuffle mappings, label-selector
resolution, UUID identity, and the read-committed dedup view (Q-DEDUP).

The driver's `events` table has no UUID columns, so the message view is
*derived* deterministically from (event_id, user_id, ts): producer,
clock, flags, journal offset, plus synthetic at-least-once redelivery.
The derivation is defined once here — identically in the Spark
expressions and the DuckDB oracle — and exercises every sequencer
outcome (duplicates, interleaved producers, committed CONTINUE runs,
rolled-back runs, ACK-without-CONTINUE, zero-UUID passthrough), per the
dedup-fixture requirements of FIXTURES.md §1.

Derivation (off = position in the journal):
  originals : off = event_id * 2
  redelivery: rows with event_id % 13 == 0 appear again at
              off = event_id * 2 + 1001 (interleaved ~500 later)
  producer  = user_id % 20            (interleaved producers)
  zero-uuid = event_id % 17 == 0  → clock 0, flags 0 (passthrough)
  flags     — three producer classes (producer % 3), so committed and
              rolled-back CONTINUE runs are exercised both clean and
              clobbered (the reference's mixed-use path,
              sequencer.go:315-325):
              class 0 (pure committed publisher): always 0
              class 1 (pure transactional): m in 0..8 → 1, m == 9 → 2
              class 2 (mixed use): m in 0..5 → 0, 6..8 → 1, 9 → 2
              where m = event_id % 10
  clock     = event_id + 1, except rollback ACKs
              (event_id % 30 == 9) use clock event_id - 4, rolling
              back any pending CONTINUEs with larger clocks AND
              resetting the committed horizon downward
              (QueueAckRollback).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from core_spark.catalog import LabelSelector, duck_journals_values, resolve
from core_spark.functions.hashing import (
    duck_md5i32,
    md5i32,
    rendezvous_mapping,
)
from core_spark.functions.uuid import (
    build_uuid,
    duck_build_uuid,
    duck_producer_node,
    duck_uuid_clock,
    duck_uuid_flags,
    duck_uuid_producer,
    producer_node,
    uuid_clock,
    uuid_flags,
    uuid_producer,
)
from core_spark.io import load_table
from core_spark.operators.sequencer import duck_read_committed, read_committed
from core_spark.plans.registry import query


# ------------------------------------------------- derived message view
def message_view(events: DataFrame) -> DataFrame:
    """Derive the UUID-stamped journal view from `events` (see module
    docstring). Returns columns: event_id, user_id, value, off,
    producer, clock, flags."""
    base = events.select("event_id", "user_id", "value")
    orig = base.withColumn("off", F.col("event_id") * 2)
    dup = base.filter(F.col("event_id") % 13 == 0).withColumn(
        "off", F.col("event_id") * 2 + 1001
    )
    msgs = orig.unionByName(dup)
    eid = F.col("event_id")
    is_zero = eid % 17 == 0
    m = eid % 10
    cls = (F.col("user_id") % 20) % 3
    return msgs.withColumns(
        {
            "producer": F.col("user_id") % 20,
            "flags": F.when(is_zero, 0)
            .when(cls == 0, 0)
            .when(cls == 1, F.when(m <= 8, 1).otherwise(2))
            .when(m <= 5, 0)
            .when(m <= 8, 1)
            .otherwise(2),
            "clock": F.when(is_zero, F.lit(0))
            .when((m == 9) & (eid % 30 == 9), eid - 4)
            .otherwise(eid + 1),
        }
    )


DUCK_MESSAGE_VIEW = """
    SELECT event_id, user_id, value, off,
           user_id % 20 AS producer,
           CASE WHEN event_id % 17 = 0 THEN 0
                WHEN (user_id % 20) % 3 = 0 THEN 0
                WHEN (user_id % 20) % 3 = 1 THEN
                     CASE WHEN event_id % 10 <= 8 THEN 1 ELSE 2 END
                WHEN event_id % 10 <= 5 THEN 0
                WHEN event_id % 10 <= 8 THEN 1
                ELSE 2 END AS flags,
           CASE WHEN event_id % 17 = 0 THEN 0
                WHEN event_id % 10 = 9 AND event_id % 30 = 9 THEN event_id - 4
                ELSE event_id + 1 END AS clock
    FROM (
      SELECT event_id, user_id, value, event_id * 2 AS off FROM events
      UNION ALL
      SELECT event_id, user_id, value, event_id * 2 + 1001 AS off
      FROM events WHERE event_id % 13 = 0
    )
"""


# --------------------------------------------------------------- Q-DEDUP
@query(
    "q_dedup",
    oracle=duck_read_committed(
        DUCK_MESSAGE_VIEW,
        offset="off",
        select_cols="event_id, user_id, value, off, producer, clock, flags",
    )
    + " ORDER BY off",
)
def q_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read-committed view of the derived journal — the signature
    exactly-once operator.

    Reference: message/sequencer.go:158-341 (QueueUncommitted outcome
    table), :344-462 (Step); semantics documented in
    core_spark/operators/sequencer.py. One shuffle on `producer`,
    window-only physical plan.
    """
    events = load_table(spark, sf_dir, "events")
    return (
        read_committed(message_view(events), offset="off")
        .select("event_id", "user_id", "value", "off", "producer", "clock", "flags")
        .orderBy("off")
    )


# ---------------------------------------------------------------- Q-SHUF
@query(
    "q_shuf",
    oracle=f"""
    SELECT event_id,
           event_type || '-' || CAST(user_id AS VARCHAR) AS key,
           {duck_md5i32("event_type || '-' || CAST(user_id AS VARCHAR)")} % 8
             AS part
    FROM events ORDER BY event_id
    """,
)
def q_shuf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ModuloMapping: stable key → partition routing.

    Reference: message/routines.go:80-101 — hash(mapping key) modulo
    the topic's partition count. Engine-internal repartitioning uses
    Spark's native hash partitioning (`repartition(n, key)`); this
    declared mapping uses the engine-independent md5-based hash so the
    routing decision is itself verifiable.
    """
    events = load_table(spark, sf_dir, "events")
    key = F.concat_ws("-", F.col("event_type"), F.col("user_id").cast("string"))
    return (
        events.select(
            "event_id",
            key.alias("key"),
            (md5i32(key) % 8).alias("part"),
        )
        .orderBy("event_id")
    )


# ---------------------------------------------------------------- Q-RDV
_RDV_PARTS = ["part-000", "part-001", "part-002", "part-003"]


@query(
    "q_rendezvous",
    oracle=f"""
    SELECT key, struct_extract(list_aggregate([{", ".join(
        "{'w': " + duck_md5i32(f"'s0:' || key || '|{p}'") + ", 'p': '" + p + "'}"
        for p in _RDV_PARTS
    )}], 'max'), 'p') AS part
    FROM (SELECT DISTINCT CAST(user_id AS VARCHAR) AS key FROM events)
    ORDER BY key
    """,
)
def q_rendezvous(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RendezvousMapping: highest-random-weight key → partition.

    Reference: message/routines.go:103-157 — weight = hash(key,
    partition); argmax wins; minimal churn on topology change. Pure
    expression (array_max over weight structs), no UDF.
    """
    events = load_table(spark, sf_dir, "events")
    keys = events.select(
        F.col("user_id").cast("string").alias("key")
    ).distinct()
    return keys.select(
        "key", rendezvous_mapping(F.col("key"), _RDV_PARTS).alias("part")
    ).orderBy("key")


# ---------------------------------------------------------------- Q-SEL
_SEL = LabelSelector(
    include={"message-type": ("bike_share.Ride", "stream_sum.Chunk")},
    exclude={"region": ("eu-west1",)},
    prefix_includes={"prefix": ("examples/",)},
)


@query(
    "q_sel",
    oracle=f"""
    WITH journals(name, labels) AS (VALUES
      {duck_journals_values()})
    SELECT name FROM journals
    WHERE len(list_filter(labels, l -> l.name = 'message-type'
            AND l.value IN ('bike_share.Ride', 'stream_sum.Chunk'))) > 0
      AND len(list_filter(labels, l -> l.name = 'region'
            AND l.value = 'eu-west1')) = 0
      AND name LIKE 'examples/%'
    ORDER BY name
    """,
)
def q_sel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-selector topic resolution over the journal catalog.

    Reference: broker/protocol/label_extensions.go:246-352 (Matches /
    matchSelector) with the reserved `prefix` meta-label; catalog
    fixture mirrors the examples' journal topology.
    """
    return resolve(spark, _SEL).orderBy("name")


# --------------------------------------------------------------- Q-UUID
@query(
    "q_uuid",
    oracle=f"""
    WITH minted AS (
      SELECT event_id,
             {duck_build_uuid(
                 duck_producer_node("user_id"),
                 "epoch_us(ts) * 10 + event_id % 10",
                 "CASE WHEN event_id % 10 <= 5 THEN 0 "
                 "WHEN event_id % 10 <= 8 THEN 1 ELSE 2 END",
             )} AS uuid
      FROM events
    )
    SELECT event_id, uuid,
           {duck_uuid_clock("uuid")} AS clock_out,
           {duck_uuid_flags("uuid")} AS flags_out,
           {duck_uuid_producer("uuid")} AS producer_out
    FROM minted ORDER BY event_id
    """,
)
def q_uuid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UUID v1 mint + unpack round-trip (attach-uuids analog).

    Reference: message/uuid.go:123-135 (BuildUUID),
    cmd/gazctl/gazctlcmd/attach_uuids.go:13-50 (batch UUID stamping
    for exactly-once file ingest). Clock = 100ns-unit timestamp +
    counter; flags in clock_seq; producer in node — all unpacked back
    out as verification.
    """
    events = load_table(spark, sf_dir, "events")
    m = F.col("event_id") % 10
    clock = F.unix_micros(F.col("ts")) * 10 + F.col("event_id") % 10
    flags = F.when(m <= 5, 0).when(m <= 8, 1).otherwise(2)
    minted = events.select(
        "event_id",
        build_uuid(producer_node(F.col("user_id")), clock, flags).alias("uuid"),
    )
    return minted.select(
        "event_id",
        "uuid",
        uuid_clock(F.col("uuid")).alias("clock_out"),
        uuid_flags(F.col("uuid")).alias("flags_out"),
        uuid_producer(F.col("uuid")).alias("producer_out"),
    ).orderBy("event_id")
