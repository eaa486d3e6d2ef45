"""Journal-storage declared query (rows-only: exercises the engine's
own storage layer, which has no DuckDB analog)."""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from core_spark.io import load_table
from core_spark.plans.registry import query
from core_spark.sources.journal import Journal


@query("q_journal_roundtrip", oracle=None)
def q_journal_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serializable append → offset-stamped fragments → pruned read.

    Writes the first 3k events into a journal as three appends (three
    immutable fragments with contiguous offsets), then serves a
    bounded offset-range read [500, 2500) — returning rows only from
    the two covering fragments, with durable per-row `_offset`s
    (broker append/read lifecycle, SURVEY §3.1-3.2, re-expressed as
    fragment files + manifest)."""
    events = load_table(spark, sf_dir, "events")
    root = tempfile.mkdtemp(prefix="q_journal_")
    j = Journal(root, "declared/events")
    # Three appends as pure DataFrame filters over the event-id range
    # (ids are dense from 0, so id < 3000 IS the first 3k events) —
    # the rows never materialize on the driver.
    for lo in range(0, 3000, 1000):
        j.append(
            events.filter(
                (F.col("event_id") >= lo) & (F.col("event_id") < lo + 1000)
            )
        )
    return (
        j.read(spark, begin=500, end=2500)
        .select("event_id", "user_id", "value", "_offset", "_journal")
        .orderBy("_offset")
    )
