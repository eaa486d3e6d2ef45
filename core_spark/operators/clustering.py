"""Lloyd k-means over embedding vectors, in engine-exact integer
arithmetic.

The reference engine has no clustering operator; this is the
LLM-pipeline superset tier (the training step behind an IVF index's
coarse quantizer and SemDeDup's cluster stage — `similarity.py` uses
designated-vector centroids for those because FLOAT averaging is not
engine-reproducible; this module shows the full Lloyd iteration IS
reproducible once vectors are quantized).

Determinism discipline (the repo-wide integer contract):

- Vectors quantize to int64 micros up front: ``round(e * 1e6)`` is a
  single IEEE double op + half-away rounding, identical in Spark and
  DuckDB. Everything downstream is int64.
- Assignment = argmin of integer squared-L2, ties broken by lower
  centroid index (min over (dist, cidx) structs).
- Update = elementwise *floor* mean ``(s - pmod(s, c)) / c`` — exact
  integer division after subtracting the positive remainder, the same
  value under Spark's truncating DIV and DuckDB's flooring ``//``.

Scale shape (100 TB): one broadcast of k centroid rows per round (k is
a constant — 8 here, ~2^16 for a real IVF index; still KBs×dims), one
map-side distance argmin (the k candidate rows per vector collapse in
the partial aggregate before any shuffle), and one (cluster, dim)-keyed
update shuffle whose width is k×dims — independent of corpus size.
Rounds are a fixed constant; the plan is linear in rounds with no
driver-side data movement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

_QUANT = "transform({vec}, e -> CAST(round(CAST(e AS DOUBLE) * 1000000) AS BIGINT))"

# Integer squared L2 between the vector and a centroid.
_DIST = (
    "aggregate(zip_with(qv, cv, (x, y) -> (x - y) * (x - y)), "
    "CAST(0 AS BIGINT), (acc, d) -> acc + d)"
)


def quantize_vectors(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(vid, qv): int64-micro copies of the input vectors."""
    return df.select(
        F.col(id_col).alias("vid"),
        F.expr(_QUANT.format(vec=vec_col)).alias("qv"),
    )


def seed_centroids(vecs: DataFrame, k: int) -> DataFrame:
    """Deterministic init: the k lowest-id vectors, indexed 0..k-1
    (the designated-vector discipline of `similarity.ivf_centroids`)."""
    w = W.orderBy("vid")  # k rows only — not a data-scale window
    return (
        vecs.orderBy("vid")
        .limit(k)
        .select(
            (F.row_number().over(w) - 1).alias("cidx"),
            F.col("qv").alias("cv"),
        )
    )


def assign(vecs: DataFrame, cents: DataFrame) -> DataFrame:
    """Nearest-centroid assignment: (vid, cluster, dist_sq).

    Broadcast argmin — each vector meets the k centroid rows map-side
    and the min(struct) partial aggregate collapses them before the
    shuffle; the corpus is never all-paired."""
    scored = vecs.join(F.broadcast(cents)).withColumn("dist", F.expr(_DIST))
    best = F.min(F.struct("dist", "cidx")).alias("m")
    return scored.groupBy("vid").agg(best).select(
        "vid",
        F.col("m.cidx").alias("cluster"),
        F.col("m.dist").alias("dist_sq"),
    )


def update(vecs: DataFrame, assigned: DataFrame) -> DataFrame:
    """Elementwise floor-mean centroids for the next round.

    One (cluster, pos)-keyed shuffle of width k×dims; clusters that
    lost every member simply vanish (both engines' GROUP BY agree)."""
    el = vecs.join(assigned.select("vid", "cluster"), "vid").select(
        "cluster", F.posexplode("qv").alias("pos", "val")
    )
    m = (
        el.groupBy("cluster", "pos")
        .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("c"))
        .withColumn("m", F.expr("(s - pmod(s, c)) DIV c"))
    )
    return m.groupBy("cluster").agg(
        F.expr("transform(sort_array(collect_list(struct(pos, m))), x -> x.m)").alias(
            "cv"
        )
    ).select(F.col("cluster").alias("cidx"), "cv")


def lloyd_centroids(
    df: DataFrame,
    k: int = 8,
    rounds: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The trained quantizer itself: (cidx, cv) after `rounds` Lloyd
    iterations over the quantized vectors."""
    vecs = persisted_quantized(quantize_vectors(df, id_col, vec_col))
    return train_centroids(vecs, k, rounds)


def persisted_quantized(vecs: DataFrame) -> DataFrame:
    """Iterative-input cache: every round reads the quantized corpus
    twice (assignment and update) and each centroid broadcast is its
    own job, so the unpersisted loop re-scans + re-quantizes ~2x per
    round. At sf0.1 the parquet scan is OS-page-cached and the
    measured delta is within host noise (~3.3s either way); the
    persist is for real input sizes, where 2x rounds re-scans of a
    non-cached corpus dominate. MEMORY_AND_DISK, int64 vectors =
    input-sized."""
    from pyspark import StorageLevel

    return vecs.persist(StorageLevel.MEMORY_AND_DISK)


def train_centroids(vecs: DataFrame, k: int, rounds: int) -> DataFrame:
    cents = seed_centroids(vecs, k)
    for _ in range(rounds):
        cents = update(vecs, assign(vecs, cents))
    return cents


def assign_topn(vecs: DataFrame, cents: DataFrame, n: int) -> DataFrame:
    """Multi-probe assignment: each vector's `n` nearest centroids by
    (dist, cidx) — (vid, cidx, dist_sq) rows. Same broadcast shape as
    `assign`; the per-vector window frame is k rows."""
    from pyspark.sql.window import Window

    scored = vecs.join(F.broadcast(cents)).withColumn("dist", F.expr(_DIST))
    w = Window.partitionBy("vid").orderBy("dist", "cidx")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= n)
        .select("vid", "cidx", F.col("dist").alias("dist_sq"))
    )


def lloyd_kmeans(
    df: DataFrame,
    k: int = 8,
    rounds: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """`rounds` Lloyd iterations; returns the final assignment
    (vid, cluster, dist_sq) against the round-`rounds` centroids.
    Training and the final assignment share one persisted quantized
    corpus."""
    vecs = persisted_quantized(quantize_vectors(df, id_col, vec_col))
    return assign(vecs, train_centroids(vecs, k, rounds))
