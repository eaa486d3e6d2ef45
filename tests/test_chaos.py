"""Chaos analog of the reference's stream-sum integration test
(examples/stream-sum/stream_sum.go:16-20: "actively verifies ...
exactly-once semantics"): force task-level failures inside the
pipeline and batch re-delivery at the sink, then require the exact
expected result — no loss, no duplication.

The task-retry case needs `spark.task.maxFailures > 1`, which is fixed
at SparkContext creation — so it runs in a subprocess with its own
local[4,3] master rather than the shared test session.
"""

import json
import subprocess
import sys
from pathlib import Path

from core_spark.sources.journal import Journal
from core_spark.streaming.sink import FencedJournalSink

REPO = Path(__file__).resolve().parents[1]

RETRY_SCRIPT = r"""
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession, functions as F
from core_spark.streaming.shard import ShardConfig, run_shard
from core_spark.sources.journal import Journal
import os, json

work = {work!r}
spark = (SparkSession.builder.master("local[4,3]")  # 3 task attempts
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

src = os.path.join(work, "src"); os.makedirs(src)
spark.range(0, 1000).select(
    (F.col("id") % 37).alias("key"), F.col("id").alias("v")
).coalesce(1).write.parquet(os.path.join(src, "c0.parquet"))

marker = os.path.join(work, "bomb-armed")
open(marker, "w").close()

def flaky_then_agg(df):
    # mapInPandas stage that fails its FIRST attempt (armed marker),
    # succeeds on retry — the pod-crash analog inside a transaction.
    def op(batches):
        from pyspark import TaskContext
        import os as _os
        ctx = TaskContext.get()
        if ctx.partitionId() == 0 and _os.path.exists(marker):
            _os.remove(marker)
            raise RuntimeError("injected task failure")
        for pdf in batches:
            yield pdf
    passed = df.repartition(4, "key").mapInPandas(op, schema="key long, v long")
    return passed.groupBy("key").agg(
        F.count("*").alias("cnt"), F.sum("v").alias("s"))

cfg = ShardConfig(
    source_glob=src + "/*", source_schema="key long, v long",
    out_root=os.path.join(work, "out"), out_journal="sum/results",
    shard_id="s0", checkpoint_dir=os.path.join(work, "ckpt"),
)
run_shard(spark, cfg, flaky_then_agg).awaitTermination(180)

j = Journal(os.path.join(work, "out"), "sum/results")
rows = j.read(spark).select("key", "cnt", "s").collect()
print("RESULT " + json.dumps(sorted((r.key, r.cnt, r.s) for r in rows)))
"""


def test_exactly_once_under_task_retry(tmp_path):
    script = RETRY_SCRIPT.format(repo=str(REPO), work=str(tmp_path / "w"))
    proc = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True,
        timeout=420,
    )
    out = [l for l in proc.stdout.splitlines() if l.startswith("RESULT ")]
    assert out, f"no result line\nstdout:{proc.stdout[-2000:]}\nstderr:{proc.stderr[-2000:]}"
    got = json.loads(out[0][len("RESULT "):])
    # expected: ids 0..999 grouped by id % 37 — exact sums, no loss/dup
    expect = {}
    for i in range(1000):
        k = i % 37
        c, s = expect.get(k, (0, 0))
        expect[k] = (c + 1, s + i)
    assert got == sorted([k, c, s] for k, (c, s) in expect.items())
    # the bomb actually went off (marker consumed)
    assert not (tmp_path / "w" / "bomb-armed").exists()


def test_ack_resent_after_crash_between_commit_and_ack(spark, tmp_path):
    root = str(tmp_path / "j")
    sink = FencedJournalSink(root, "out/r", shard="s0")
    batch = spark.range(0, 10).withColumnRenamed("id", "v")
    sink(batch, 0)
    ack = Path(Journal(root, "out/r").root) / "_acks" / "batch-0.json"
    ack.unlink()  # simulate crash after commit, before ACK append

    sink(batch, 0)  # re-delivery: data must not duplicate, ACK must re-send
    assert Journal(root, "out/r").read(spark).count() == 10
    assert ack.exists()
