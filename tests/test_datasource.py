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


def test_partitioned_fragments_served_with_discovery(spark, tmp_path):
    """Hive path-postfix fragments (partitionBy) must be readable
    through format("journal") — partition columns restored from the
    key=value path segments, matching Journal.read's native-discovery
    view (values AND inferred column types)."""
    root = str(tmp_path / "journals")
    j = Journal(root, "ds/part")
    df = spark.range(0, 40).select(
        F.col("id").alias("k"),
        (F.col("id") % 3).alias("day"),
        F.concat(F.lit("s"), (F.col("id") % 2).cast("string")).alias("site"),
    )
    j.append(df.filter(F.col("k") < 25), path_postfix=("day", "site"))
    j.append(df.filter(F.col("k") >= 25), path_postfix=("day", "site"))
    spark.dataSource.register(journal_datasource())

    got = (
        spark.read.format("journal")
        .option("root", root)
        .option("name", "ds/part")
        .load()
    )
    want = j.read(spark).drop("_journal")
    assert dict(got.dtypes) == dict(want.dtypes)
    key = lambda r: (r.k, r.day, r.site, r._offset)  # noqa: E731
    assert sorted(map(key, got.collect())) == sorted(map(key, want.collect()))
    assert got.count() == 40


def test_partitioned_tail_streams_through_manifest(spark, tmp_path):
    """Tailing a partitionBy journal via readStream.format("journal")
    — previously only Journal.read could serve these fragments."""
    root = str(tmp_path / "journals")
    j = Journal(root, "ds/ptail")
    mk = lambda lo, hi: spark.range(lo, hi).select(  # noqa: E731
        F.col("id").alias("k"), (F.col("id") % 2).alias("bucket")
    )
    j.append(mk(0, 20), path_postfix=("bucket",))
    spark.dataSource.register(journal_datasource())
    stream = (
        spark.readStream.format("journal")
        .option("root", root)
        .option("name", "ds/ptail")
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("ds_ptail")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        j.append(mk(20, 30), path_postfix=("bucket",))
        q.processAllAvailable()
        rows = spark.sql(
            "SELECT k, bucket, _offset FROM ds_ptail ORDER BY _offset"
        ).collect()
        assert len(rows) == 30
        assert [r._offset for r in rows] == list(range(30))
        assert all(r.bucket == r.k % 2 for r in rows)
    finally:
        q.stop()


def test_partition_type_inference_matches_native_edge_forms(spark, tmp_path):
    """The python datasource's partition-type ladder must agree with
    Spark's native discovery on the forms where Python's int()/float()
    are laxer (ADVICE r3): '+5' IS int natively (and reads back as 5),
    while '1_000', 'inf', 'nan' are strings; 'NaN' (Java case) is
    double. A disagreement would give the same journal two schemas
    depending on the read path."""
    root = str(tmp_path / "journals")
    j = Journal(root, "ds/edge")
    rows = [("+5", "1_000", "inf", "NaN"), ("7", "22", "nan", "Infinity")]
    df = spark.createDataFrame(rows, "a string, b string, c string, d string")
    j.append(df.withColumn("k", F.lit(1)), path_postfix=("a", "b", "c", "d"))
    spark.dataSource.register(journal_datasource())

    got = (
        spark.read.format("journal")
        .option("root", root)
        .option("name", "ds/edge")
        .load()
    )
    want = j.read(spark).drop("_journal")
    assert dict(got.dtypes) == dict(want.dtypes)
    for d in (dict(got.dtypes),):
        assert d["a"] == "int", d      # '+5' parses as int natively
        assert d["b"] == "string", d   # '1_000' does not
        assert d["c"] == "string", d   # lowercase inf/nan are strings
        assert d["d"] == "double", d   # Java NaN/Infinity literals
    key = lambda r: (r.k, r.a, r.b, r.c, str(r.d))  # noqa: E731
    assert sorted(map(key, got.collect())) == sorted(map(key, want.collect()))
