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
import pytest

from pathlib import Path

from core_spark.sources.journal import Journal
from core_spark.streaming.sink import FencedJournalSink

# kill/retry recovery fuzzes: opt-in slow tier (r14 test tiering)
pytestmark = pytest.mark.slow

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


# ---------------------------------------------------------------------
# Recovery-time bound: the reference's chunker escalates through a
# deadline sequence while waiting for each expected sum and calls
# log.Fatal at the final one (examples/stream-sum/stream_sum.go:
# 393-418 — lease detection + client backoff + headroom = fatal at
# 40s). The analog below force-kills a live shard mid-stream
# (SIGKILL, no cleanup), restarts it against the same checkpoint, and
# requires the full expected result to ARRIVE within an escalating
# deadline scaled to this harness (subprocess JVM startup ~10-15s +
# checkpoint restore + trigger interval) — a failing-on-stall
# liveness assertion, not just eventual equality.

CHAOS_SHARD_SCRIPT = r"""
import sys
sys.path.insert(0, {repo!r})
import os
from pyspark.sql import SparkSession, functions as F
from core_spark.streaming.shard import ShardConfig, run_shard

work = {work!r}
spark = (SparkSession.builder.master("local[4]")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

def agg(df):
    return df.groupBy("key").agg(
        F.count("*").alias("cnt"), F.sum("v").alias("s"))

cfg = ShardConfig(
    source_glob=os.path.join(work, "src", "*"),
    source_schema="key long, v long",
    out_root=os.path.join(work, "out"), out_journal="sum/results",
    shard_id="s0", checkpoint_dir=os.path.join(work, "ckpt"),
    trigger_seconds=0.5, max_files_per_trigger=2,
)
q = run_shard(spark, cfg, agg)
print("SHARD-RUNNING", flush=True)
q.awaitTermination()
"""

# deadline escalation, seconds from recovery launch; final = fatal
RECOVERY_DEADLINES = [10, 15, 20, 30, 45, 60, 90, 120]


def _await_within_deadlines(check, seq, what):
    """Poll `check` under the reference's escalating-deadline shape:
    warn as each deadline lapses, fail the test hard at the final one.
    Returns the arrival delay in seconds."""
    import time

    start = time.monotonic()
    missed = []
    for d in seq:
        while time.monotonic() - start < d:
            if check():
                return time.monotonic() - start
            time.sleep(0.5)
        missed.append(d)
        print(f"WARN: {what} delayed past {d}s", flush=True)
    raise AssertionError(
        f"{what} did not arrive within {seq[-1]}s "
        f"(deadlines missed: {missed}) — recovery stalled"
    )


def test_recovery_bound_after_mid_stream_kill(spark, tmp_path):
    import os
    import signal
    import time

    from pyspark.sql import functions as F

    work = tmp_path / "w"
    src = work / "src"
    os.makedirs(src)

    def write_chunk(i):
        spark.range(i * 100, (i + 1) * 100).select(
            (F.col("id") % 7).alias("key"), F.col("id").alias("v")
        ).coalesce(1).write.parquet(str(src / f"c{i}.parquet"))

    for i in range(5):
        write_chunk(i)

    script = CHAOS_SHARD_SCRIPT.format(repo=str(REPO), work=str(work))
    env = {**os.environ, "PYTHONUNBUFFERED": "1"}

    proc_a = subprocess.Popen(
        [sys.executable, "-c", script], stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL, text=True, env=env,
    )
    try:
        # wait for the first committed fragment, then kill WITHOUT
        # any cleanup — the pod-crash, not a graceful stop
        j = Journal(str(work / "out"), "sum/results")
        deadline = time.monotonic() + 120
        while time.monotonic() < deadline:
            if len(j.manifest().fragments) >= 1:
                break
            time.sleep(0.25)
        else:
            raise AssertionError("shard never committed a first batch")
        proc_a.send_signal(signal.SIGKILL)
        proc_a.wait(timeout=30)
    finally:
        if proc_a.poll() is None:
            proc_a.kill()

    # new data lands while the shard is dead
    for i in range(5, 10):
        write_chunk(i)

    expect = {}
    for i in range(1000):
        k = i % 7
        c, s = expect.get(k, (0, 0))
        expect[k] = (c + 1, s + i)

    def caught_up():
        try:
            rows = (
                j.read(spark)
                .groupBy("key")
                .agg(F.sum("cnt").alias("c"), F.sum("s").alias("s"))
                .collect()
            )
        except Exception:
            return False
        return {r.key: (r.c, r.s) for r in rows} == expect

    proc_b = subprocess.Popen(
        [sys.executable, "-c", script], stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL, env=env,
    )
    try:
        delay = _await_within_deadlines(
            caught_up, RECOVERY_DEADLINES, "post-kill expected sum"
        )
        print(f"recovered in {delay:.1f}s", flush=True)
    finally:
        proc_b.terminate()
        try:
            proc_b.wait(timeout=30)
        except subprocess.TimeoutExpired:
            proc_b.kill()

    # and exactly-once held across the kill: equality was the arrival
    # condition, so any duplicated redelivery would have parked the
    # sums PAST the expectation and tripped the deadline instead
    assert caught_up()
