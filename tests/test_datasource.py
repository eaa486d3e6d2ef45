"""Journal data source: batch read parity with Journal.read, and the
streaming tail picking up fragments appended AFTER the query starts —
the MessageProducer-override path (consumer/interfaces.go:117-141)."""

import os

from pyspark.sql import functions as F

from core_spark.sources.datasource import journal_datasource
from core_spark.sources.journal import Journal


def _setup(spark, tmp_path):
    root = str(tmp_path / "journals")
    j = Journal(root, "ds/events")
    df = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    j.append(df.filter(F.col("k") < 60))
    j.append(df.filter(F.col("k") >= 60))
    spark.dataSource.register(journal_datasource())
    return root, j, df


def test_batch_read_matches_journal_read(spark, tmp_path):
    root, j, df = _setup(spark, tmp_path)
    got = (
        spark.read.format("journal")
        .option("root", root)
        .option("name", "ds/events")
        .load()
    )
    assert sorted((r.k, r.v, r._offset) for r in got.collect()) == sorted(
        (r.k, r.v, r._offset) for r in j.read(spark).drop("_journal").collect()
    )
    assert got.count() == 100


def test_stream_tails_new_fragments(spark, tmp_path):
    root, j, df = _setup(spark, tmp_path)
    stream = (
        spark.readStream.format("journal")
        .option("root", root)
        .option("name", "ds/events")
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("ds_tail")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        assert spark.sql("SELECT count(*) c FROM ds_tail").first().c == 100
        # append AFTER the query started: the tail must pick it up
        j.append(
            spark.range(100, 130).select(
                F.col("id").alias("k"), (F.col("id") * 2).alias("v")
            )
        )
        q.processAllAvailable()
        rows = spark.sql("SELECT k, _offset FROM ds_tail ORDER BY _offset").collect()
        assert len(rows) == 130
        # journal offsets are contiguous across the live append
        assert [r._offset for r in rows] == list(range(130))
    finally:
        q.stop()


def test_shard_tails_journal_source_end_to_end(spark, tmp_path):
    """journal in -> shard transform -> fenced journal out, with the
    source consumed through its own manifest (no file glob)."""
    from core_spark.streaming.shard import ShardConfig, run_shard

    root = str(tmp_path / "journals")
    src_j = Journal(root, "in/words")
    words = spark.createDataFrame(
        [("a",), ("b",), ("a",), ("c",), ("b",), ("a",)], "word string"
    )
    src_j.append(words)

    cfg = ShardConfig(
        source_glob=None,
        source_schema=None,
        out_root=root,
        out_journal="out/deltas",
        shard_id="s0",
        checkpoint_dir=str(tmp_path / "ckpt"),
        source_root=root,
        source_journal="in/words",
    )

    def deltas(df):
        return df.groupBy("word").agg(F.count("*").alias("cnt"))

    run_shard(spark, cfg, deltas).awaitTermination(120)
    out = Journal(root, "out/deltas").read(spark)
    totals = {
        r.word: r.total
        for r in out.groupBy("word").agg(F.sum("cnt").alias("total")).collect()
    }
    assert totals == {"a": 3, "b": 2, "c": 1}
