"""Scale-probe: measured evidence for the DESIGN.md scale claims.

Replicates /root/testdata/sf0.1 R times into a scratch dir as a
*sharded* scale-up — each replica is a self-contained shard, the way
a 10x database actually grows — then times a set of headline queries
at 1x and Rx and reports the wall-clock scaling exponent
log(t_R/t_1)/log(R). An operator whose plan is linear in the input
(partial aggregation, bucketed candidate generation, broadcast argmax)
should land near 1.0 on a fixed-core box; anything near 2.0 has an
all-pairs stage hiding in it.

Replica construction (replica 0 is byte-identical to the source):
- TPC-H tables: every key column is offset by replica * stride, so
  joins match only within a replica — selectivities, join fan-outs
  and per-key group sizes are preserved; global row counts scale Rx.
- documents: doc_id offset; every word gets a per-replica suffix, so
  replicas are vocabulary-disjoint — the per-replica dup/near-dup
  pair structure is preserved EXACTLY (pair counts scale Rx linear).
  Naive text replication would instead make every doc a 10-way
  near-duplicate and blow pairs up quadratically — a different
  workload, not a scale-up of this one.
- embeddings: vec_id offset; replicas > 0 get fresh md5-seeded
  uniform vectors, matching the source generator's iid shape — again
  pair structure scales linearly instead of every vector gaining
  R-1 exact twins.
- events: event_id/user_id offset, timestamps unchanged.

Usage:
    python tools/scale_probe.py [--replicas 10] [--out /tmp/scale_probe]
        [--queries q_minhash_lsh,q_dup_clusters,...]

Prints one JSON line: {"replicas": R, "queries": {name: {"t1": s,
"tR": s, "exponent": e}}}.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from core_spark.io import TABLES, load_table  # noqa: E402
from core_spark.plans.registry import REGISTRY  # noqa: E402
from core_spark.session import get_spark  # noqa: E402

STRIDE = 1_000_000_000  # key offset per replica; far above any sf0.1 id

# key columns to offset, per table
KEYS = {
    "region": ["r_regionkey"],
    "nation": ["n_nationkey", "n_regionkey"],
    "customer": ["c_custkey", "c_nationkey"],
    "supplier": ["s_suppkey", "s_nationkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

DEFAULT_QUERIES = [
    "q_tpch1",
    "q_tpch3",
    "q_dedup_exact",
    "q_minhash_lsh",
    "q_ngram_jaccard",
    "q_dup_clusters",
    "q_dup_spans",
    "q_embed_dup",
    "q_embed_semdedup",
    "q_ann_lsh",
    "q_dsir",
    "q_doc_lm",
    "q_bpe_pairs",
    "q_domain_mix",
    "q_domain_sample",
    "q_graph_triangles",
    "q_approx_quantile",
    "q_curate",
]


def replicate(spark: SparkSession, src: str, out: str, replicas: int) -> None:
    reps = spark.range(replicas).select(F.col("id").alias("_rep"))
    for t in TABLES:
        df = load_table(spark, src, t).crossJoin(F.broadcast(reps))
        for k in KEYS.get(t, []):
            df = df.withColumn(k, F.col(k) + F.col("_rep") * F.lit(STRIDE))
        if t == "documents":
            # per-replica word suffix -> vocabulary-disjoint replicas
            df = df.withColumn(
                "text",
                F.when(F.col("_rep") == 0, F.col("text")).otherwise(
                    F.array_join(
                        F.expr(
                            "transform(split(text, ' '), "
                            "w -> concat(w, '_r', CAST(_rep AS STRING)))"
                        ),
                        " ",
                    )
                ),
            )
        if t == "embeddings":
            # fresh md5-seeded uniform floats in [-1, 1) per replica
            df = df.withColumn(
                "embedding",
                F.when(F.col("_rep") == 0, F.col("embedding")).otherwise(
                    F.expr(
                        "transform(sequence(0, size(embedding) - 1), i -> "
                        "CAST((CAST(conv(substring(md5(concat("
                        "CAST(vec_id AS STRING), ':', CAST(i AS STRING)"
                        ")), 1, 8), 16, 10) AS BIGINT) % 2000 - 1000) / 1000.0"
                        " AS FLOAT))"
                    )
                ),
            )
        df.drop("_rep").write.mode("overwrite").parquet(
            os.path.join(out, f"{t}.parquet")
        )


def time_query(spark: SparkSession, name: str, sf_dir: str) -> float:
    q = REGISTRY[name]
    best = math.inf
    q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
    for _ in range(2):
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
        spark.catalog.clearCache()
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/scale_probe")
    ap.add_argument("--queries", default=",".join(DEFAULT_QUERIES))
    ap.add_argument("--skip-gen", action="store_true")
    args = ap.parse_args()

    spark = get_spark(app_name="scale-probe")
    big_dir = os.path.join(args.out, f"x{args.replicas}")
    if not args.skip_gen:
        replicate(spark, args.src, big_dir, args.replicas)

    results = {}
    for name in args.queries.split(","):
        name = name.strip()
        if not name:
            continue
        t1 = time_query(spark, name, args.src)
        tr = time_query(spark, name, big_dir)
        results[name] = {
            "t1": round(t1, 3),
            "tR": round(tr, 3),
            "exponent": round(
                math.log(tr / t1) / math.log(args.replicas), 3
            ),
        }
        print(f"# {name}: {t1:.2f}s -> {tr:.2f}s", file=sys.stderr)

    print(
        json.dumps(
            {"replicas": args.replicas, "src": args.src, "queries": results}
        )
    )


if __name__ == "__main__":
    main()
