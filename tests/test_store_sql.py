"""Remote-SQL store: the gazette_checkpoints fence pattern against a
real database (sqlite), mirroring test_fenced_sink_rejects_zombie for
the DB-backed store — zombie rejection, crash/resume from the DB
checkpoint, and a streaming foreachBatch end-to-end.

Reference: consumer/store_sql.go:12-146 (fence-increment restore,
rowcount-CAS commit), examples/bike-share/application.go:134-199
(serving reads from the materialized table)."""

import os
import sqlite3

import pytest
from pyspark.sql import functions as F

from core_spark.streaming.store_sql import FencedOff, SQLStore


def _batch(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )


def test_restore_bumps_fence_and_reads_checkpoint(spark, tmp_path):
    db = str(tmp_path / "state.db")
    a = SQLStore(db, shard="s0")
    assert (a.fence, a.committed_batch) == (1, -1)
    a.materialize("t", _batch(spark, 0, 5), 0, key_cols=("k",))
    assert a.committed_batch == 0

    b = SQLStore(db, shard="s0")
    # fence strictly larger; checkpoint restored from the DB row
    assert b.fence == 2
    assert b.committed_batch == 0
    # independent shard keys fence independently
    other = SQLStore(db, shard="s1")
    assert (other.fence, other.committed_batch) == (1, -1)


def test_zombie_writer_is_fenced_and_writes_nothing(spark, tmp_path):
    db = str(tmp_path / "state.db")
    old = SQLStore(db, shard="s0")
    old.materialize("t", _batch(spark, 0, 5), 0, key_cols=("k",))

    new = SQLStore(db, shard="s0")
    assert new.fence > old.fence
    new.materialize("t", _batch(spark, 5, 10), 1, key_cols=("k",))

    # the zombie's next commit fails the rowcount CAS...
    with pytest.raises(FencedOff):
        old.materialize("t", _batch(spark, 10, 15), 2, key_cols=("k",))
    # ...and its re-delivery of an old batch may not report success
    with pytest.raises(FencedOff):
        old.materialize("t", _batch(spark, 0, 5), 0, key_cols=("k",))

    # the failed transaction left no rows: 0..9 only
    rows = sqlite3.connect(db).execute(
        "SELECT COUNT(*), MIN(k), MAX(k) FROM t"
    ).fetchone()
    assert rows == (10, 0, 9)
    # and the checkpoint still names the live incarnation's batch
    assert SQLStore(db, shard="s0").committed_batch == 1


def test_resume_from_db_checkpoint_skips_redelivery(spark, tmp_path):
    """Crash after batch 2; the restarted shard restores batch=2 from
    the DB and Spark's re-delivery of batch 2 is a no-op — rows and
    checkpoint commit atomically, so no duplicates are possible."""
    db = str(tmp_path / "state.db")
    a = SQLStore(db, shard="s0")
    for b in range(3):
        a.materialize("t", _batch(spark, b * 5, b * 5 + 5), b,
                      key_cols=("k",))
    del a  # crash: no clean shutdown

    b2 = SQLStore(db, shard="s0")
    assert b2.committed_batch == 2
    assert b2.materialize("t", _batch(spark, 10, 15), 2,
                          key_cols=("k",)) is False  # re-delivery skipped
    assert b2.materialize("t", _batch(spark, 15, 20), 3,
                          key_cols=("k",)) is True
    rows = sqlite3.connect(db).execute(
        "SELECT COUNT(*), COUNT(DISTINCT k) FROM t"
    ).fetchone()
    assert rows == (20, 20)


def test_rows_and_checkpoint_commit_atomically(spark, tmp_path):
    """A failure mid-apply rolls the whole transaction back: neither
    rows nor checkpoint advance (state and progress cannot diverge)."""
    db = str(tmp_path / "state.db")
    store = SQLStore(db, shard="s0")
    store.materialize("t", _batch(spark, 0, 5), 0, key_cols=("k",))

    def boom(cur):
        cur.execute("INSERT INTO t (k, v) VALUES (999, 0)")
        raise RuntimeError("mid-transaction crash")

    with pytest.raises(RuntimeError, match="mid-transaction"):
        store.commit_batch(1, boom)
    con = sqlite3.connect(db)
    assert con.execute("SELECT COUNT(*) FROM t WHERE k=999").fetchone()[0] == 0
    assert store.committed_batch == 0
    assert SQLStore(db, shard="s0").committed_batch == 0


def test_streaming_foreachbatch_materializes_exactly_once(spark, tmp_path):
    """writeStream.foreachBatch(store.sink(...)) over a file stream:
    every input row lands exactly once, the checkpoint tracks the
    last batch, and a restarted stream (new store incarnation, same
    Spark checkpoint) re-emits nothing."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    for i, words in enumerate((["a", "b", "a"], ["b", "c"])):
        spark.createDataFrame(
            [(i * 10 + j, w) for j, w in enumerate(words)],
            "rid long, word string",
        ).coalesce(1).write.parquet(os.path.join(src, f"c{i}.parquet"))

    db = str(tmp_path / "state.db")
    ckpt = str(tmp_path / "ckpt")
    store = SQLStore(db, shard="wc-0")
    q = (
        spark.readStream.schema("rid long, word string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
        .writeStream.foreachBatch(store.sink("words", key_cols=("rid",)))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    con = sqlite3.connect(db)
    got = sorted(con.execute("SELECT rid, word FROM words"))
    assert got == [(0, "a"), (1, "b"), (2, "a"), (10, "b"), (11, "c")]

    # restart with a fresh incarnation: no re-emission, fence bumped
    store2 = SQLStore(db, shard="wc-0")
    q2 = (
        spark.readStream.schema("rid long, word string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
        .writeStream.foreachBatch(store2.sink("words", key_cols=("rid",)))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    assert sorted(con.execute("SELECT rid, word FROM words")) == got
    assert store2.fence == 2


def test_served_query_matches_source(spark, tmp_path):
    """The bike-share serving pattern in miniature: a read from the
    materialized table equals the same aggregate computed in Spark."""
    db = str(tmp_path / "state.db")
    store = SQLStore(db, shard="agg-0")
    df = _batch(spark, 0, 50).withColumn("g", F.col("k") % 3)
    store.materialize("t", df, 0, key_cols=("k",))
    served = store.query(
        "SELECT g, COUNT(*), SUM(v) FROM t GROUP BY g ORDER BY g"
    )
    want = [
        (r.g, r.c, r.s)
        for r in df.groupBy("g")
        .agg(F.count("*").alias("c"), F.sum("v").alias("s"))
        .orderBy("g")
        .collect()
    ]
    assert served == want
