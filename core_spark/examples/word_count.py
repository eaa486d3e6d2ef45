"""word-count: streaming grouped counts with a prefix-query API.

Reference: examples/word-count — sentences journal → NGramCount deltas
(word_count.go:109-153 ConsumeMessage/FinalizeTxn) materialized in
RocksDB, queried by prefix scan (word_count.go:222-278).

Engine form: shard runner tails the sentences journal, emits per-batch
(ngram, delta) fragments into a deltas journal (the word-count deltas
topic); the materialized view is the running SUM over deltas; the
query API is a prefix predicate over it (pushed to the scan, exactly
the RocksDB Seek/ValidForPrefix shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from core_spark.sources.journal import Journal
from core_spark.streaming.shard import ShardConfig, run_shard


def ngram_deltas(sentences: DataFrame, n: int = 2) -> DataFrame:
    """Tokenize → n-grams → per-batch partial counts
    (word_count.go:168-171 FieldsFunc tokenization + lower)."""
    toks = F.split(F.lower(F.col("sentence")), " +")
    grams = F.expr(
        f"CASE WHEN size(_toks) >= {n} THEN "
        f"transform(sequence(0, size(_toks) - {n}), "
        f"i -> concat_ws(' ', slice(_toks, i + 1, {n}))) "
        "ELSE array() END"
    )
    return (
        sentences.withColumn("_toks", toks)
        .select(F.explode(grams).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count("*").alias("delta"))
    )


def run_word_count(
    spark: SparkSession,
    source_glob: str,
    out_root: str,
    checkpoint_dir: str,
) -> None:
    cfg = ShardConfig(
        source_glob=source_glob,
        source_schema="sentence string",
        out_root=out_root,
        out_journal="word-count/deltas",
        shard_id="word-count-0",
        checkpoint_dir=checkpoint_dir,
    )
    run_shard(spark, cfg, ngram_deltas).awaitTermination(300)


def counts_view(spark: SparkSession, out_root: str) -> DataFrame:
    """The materialized running count (deltas folded)."""
    deltas = Journal(out_root, "word-count/deltas").read(spark)
    return deltas.groupBy("ngram").agg(F.sum("delta").alias("cnt"))


def query_prefix(spark: SparkSession, out_root: str, prefix: str) -> DataFrame:
    """Prefix-scan query API (word_count.go:222-278)."""
    return counts_view(spark, out_root).filter(
        F.col("ngram").startswith(prefix)
    ).orderBy("ngram")
