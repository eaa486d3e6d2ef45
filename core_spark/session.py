"""SparkSession factory.

Defaults are tuned so the same code is correct on local[N] (tests,
bench) and on a large cluster (the 100 TB target):

- AQE on: runtime shuffle-partition coalescing, skew-join splitting and
  dynamic broadcast conversion replace hand-tuned partition counts at
  scale (a 1000-executor run re-plans per-stage from real sizes).
- UTC session timezone: parity with DuckDB oracle timestamps.
- Arrow enabled: every Pandas-UDF operator ships columnar batches.
- shuffle.partitions is only the *initial* number; AQE coalesces. On a
  real cluster this should be ~2-3x total cores; we default to the
  local CPU budget.
- Arrow batches are BYTES-bounded, not just row-bounded: media
  operators carry ~50 KB binary payloads per row (MP3/MP4/FLAC
  blobs), so the default 10k-rows-per-batch slicing produces ~500 MB
  ArrowRecordBatches — 32 concurrent tasks then exhaust the JVM's
  direct-memory pool (measured: the 100x scale probe died allocating
  a 537 MB netty buffer). maxBytesPerBatch=32m keeps per-task Arrow
  footprint constant no matter how wide the payload column is; for
  the common narrow-column kernels the rows cap still binds first,
  so their batching is unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "core_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine SparkSession.

    Env knobs (driver contract): SPARK_GRAFT_CPUS sets local parallelism.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or max(cpus, 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxBytesPerBatch", "33554432")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)

    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
