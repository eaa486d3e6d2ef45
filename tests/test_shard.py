"""Shard runner: word-count-shaped pipeline (tail journal → per-batch
grouped deltas → fenced out-journal), with restart/resume and no
duplication — the consumer-transaction loop end-to-end."""

import os

from pyspark.sql import functions as F

from core_spark.sources.journal import Journal
from core_spark.streaming.shard import ShardConfig, run_shard


def _write_chunk(spark, src, name, words):
    spark.createDataFrame([(w,) for w in words], "word string").coalesce(
        1
    ).write.parquet(os.path.join(src, name))


def test_shard_word_count_resume(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    _write_chunk(spark, src, "c0.parquet", ["a", "b", "a"])
    _write_chunk(spark, src, "c1.parquet", ["b", "c"])

    cfg = ShardConfig(
        source_glob=src + "/*",
        source_schema="word string",
        out_root=str(tmp_path / "out"),
        out_journal="wc/deltas",
        shard_id="shard-0",
        checkpoint_dir=str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
    )

    def deltas(df):
        return df.groupBy("word").agg(F.count("*").alias("cnt"))

    q = run_shard(spark, cfg, deltas)
    q.awaitTermination(120)

    j = Journal(str(tmp_path / "out"), "wc/deltas")
    totals = {
        r.word: r.total
        for r in j.read(spark)
        .groupBy("word")
        .agg(F.sum("cnt").alias("total"))
        .collect()
    }
    assert totals == {"a": 2, "b": 2, "c": 1}

    # restart with no new input: nothing re-emitted
    cfg2 = ShardConfig(**cfg.__dict__)  # new incarnation: fence auto-bumps
    run_shard(spark, cfg2, deltas).awaitTermination(120)
    assert j.read(spark).count() == j.read(spark).dropDuplicates().count()
    totals2 = {
        r.word: r.total
        for r in j.read(spark).groupBy("word").agg(F.sum("cnt").alias("total")).collect()
    }
    assert totals2 == totals

    # new chunk after restart: only the delta lands
    _write_chunk(spark, src, "c2.parquet", ["c", "c"])
    cfg3 = ShardConfig(**cfg.__dict__)
    run_shard(spark, cfg3, deltas).awaitTermination(120)
    totals3 = {
        r.word: r.total
        for r in j.read(spark).groupBy("word").agg(F.sum("cnt").alias("total")).collect()
    }
    assert totals3 == {"a": 2, "b": 2, "c": 3}
