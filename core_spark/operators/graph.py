"""Connected components over a pair graph — dedup cluster resolution.

Every near-dup pipeline ends with this step: pair detection (LSH /
SimHash / Jaccard) emits edges, and the *canonical document* is the
minimum doc_id reachable through any chain of pairs. Components are
computed by min-label propagation: each node starts labeled with
itself; every round each node takes the min label among itself and
its neighbors; fixpoint = components.

Scale notes (100 TB):
- Each round is ONE shuffle keyed on node id (a union of the label
  table with the neighbor-projected labels, then a min aggregate with
  map-side partial combine). No all-pairs, no driver-side data.
- Round count is the graph diameter. Dup clusters are short chains
  (pair generators emit near-cliques), so the fixpoint lands in a
  handful of rounds; `max_iter` bounds pathological chains.
- The convergence check is a SCALAR (did any label improve — a
  limit(1).count() probe), not a collect of data; the driver never
  holds rows. Spark 4.1's recursive CTE cannot express this today
  (min-label needs UNION-distinct semantics or an aggregate between
  steps, both unsupported in recursion), so the loop is explicit —
  the same plan GraphFrames/GraphX materialize for their CC.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 20,
    shuffle_partitions: int | None = None,
) -> DataFrame:
    """Resolve undirected pair edges into components.

    Output: (doc_id, cluster_id) for every node that appears in a
    pair; cluster_id = min node id of the component.

    `shuffle_partitions` pins the LABEL LOOP's shuffle width (restored
    afterwards): every round materializes eagerly, so a caller
    session's default (200) costs 200 tasks x rounds x 3 jobs even on
    a small pair graph. Size it to the expected edge count — the pair
    graph is orders of magnitude smaller than the corpus. Edge
    generation (the upstream pair pipeline) runs BEFORE the pin at the
    caller's full width — it scans the corpus and wants the
    parallelism the label rounds don't.
    """
    fwd = pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    edges = (
        fwd.unionByName(fwd.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        .persist()
    )
    edges.count()  # materialize the pair pipeline at caller width

    spark = pairs.sparkSession
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    if shuffle_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    try:
        return _cc_loop(edges, max_iter)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)


def _cc_loop(edges: DataFrame, max_iter: int) -> DataFrame:
    # localCheckpoint truncates lineage each round: without it the
    # logical plan doubles per iteration (the label table references
    # its whole history) and the analyzer blows up after ~10 rounds.
    # On a cluster the same role is played by reliable checkpoint()
    # to the journal store.
    labels = (
        edges.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("lbl", F.col("node"))
        .localCheckpoint()
    )
    # Convergence probe: labels only ever decrease, so sum(lbl)
    # strictly decreases iff any label improved — a scan + scalar
    # aggregate instead of an old-vs-new shuffle join. Decimal(38)
    # keeps the sum exact for arbitrarily large id spaces.
    def _checksum(df: DataFrame) -> int:
        return df.agg(
            F.sum(F.col("lbl").cast("decimal(38,0)")).alias("s")
        ).first()["s"]

    # No pre-loop checksum: round 1 always changes labels when edges
    # exist, so the first comparison happens between rounds 1 and 2.
    prev_sum = None
    for _ in range(max_iter):
        nbr = labels.join(
            edges, labels["node"] == edges["u"], "inner"
        ).select(F.col("v").alias("node"), "lbl")
        labels = (
            labels.unionByName(nbr)
            .groupBy("node")
            .agg(F.min("lbl").alias("lbl"))
            .localCheckpoint()
        )
        new_sum = _checksum(labels)
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    edges.unpersist()
    return labels.select(
        F.col("node").alias("doc_id"), F.col("lbl").alias("cluster_id")
    )
