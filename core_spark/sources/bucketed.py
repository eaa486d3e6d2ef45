"""Bucketed journal materialization — co-located joins without a
shuffle.

Reference mapping: the reference's shards "represent a join over
messages of distinct journals" when the journals are partitioned on
the same mapping key (consumer/protocol/protocol.proto:64-78, and the
bike-share example's co-keyed topics). The broker never re-shuffles:
producers route each message by the SAME ModuloMapping on both
topics, so partition i of topic A only ever joins partition i of
topic B. The Spark-native expression of that contract is storage
bucketing: write both sides `bucketBy(n, key)`, and every later join
on the key reads bucket i against bucket i with NO exchange on
either side — the join cost at 100 TB becomes a local merge per
bucket, which is exactly what the aligned-journal design buys the
reference.

Physical notes:
- Each side is `repartition(n, key)` before the bucketed write so a
  bucket is ONE file (bucketBy alone writes one file per task per
  bucket, which fans small files at width x buckets).
- `sortBy(key)` persists the sort, so Spark can skip the SMJ's sort
  stages when one file per bucket holds (plan shows SortMergeJoin
  without Sort children).
- Bucket count is the long-lived contract, chosen like the
  reference's topic partition count: total size / target task size,
  fixed at table creation, shared by every co-keyed table. At 100 TB
  with 512 MiB tasks that is ~200k buckets — Spark's bucketed scan
  handles it; re-bucketing is a full rewrite exactly as re-sharding
  a topic is.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int,
    path: str,
) -> None:
    """Materialize `df` as a bucketed external parquet table named
    `table` at `path`, bucketed AND sorted by `key` into `buckets`
    files (one per bucket)."""
    (
        df.repartition(buckets, F.col(key))
        .write.format("parquet")
        .bucketBy(buckets, key)
        .sortBy(key)
        .option("path", path)
        .mode("overwrite")
        .saveAsTable(table)
    )


def co_located_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    left_key: str,
    right_key: str,
) -> DataFrame:
    """Join two co-bucketed tables on their bucket keys. With equal
    bucket counts the plan contains no Exchange on either side (the
    plan-shape test pins this). The `merge` hint pins the sort-merge
    strategy: at toy scale Catalyst would broadcast one side (also
    exchange-free, but not the co-location contract under test), and
    at fact-x-fact scale — the case bucketing exists for — merge is
    what it would pick anyway."""
    lt = spark.table(left_table)
    rt = spark.table(right_table)
    return lt.hint("merge").join(rt, lt[left_key] == rt[right_key])
