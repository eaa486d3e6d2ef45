"""Clustering-tier declared queries (LLM-pipeline superset).

`q_cluster_kmeans` is the fourth fully-declarative iterative algorithm beside
connected components, PageRank and BPE training: Lloyd k-means whose
every round is engine-exact integer arithmetic, so the oracle (the
same rounds unrolled as chained CTEs) hash-matches the assignments —
not just the row counts — of an iterative float-free clustering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from core_spark.io import load_table
from core_spark.operators.clustering import (
    assign,
    assign_topn,
    lloyd_kmeans,
    persisted_quantized,
    quantize_vectors,
    train_centroids,
)
from core_spark.plans.registry import query

_K = 8
_ROUNDS = 3
_DIMS = 64


def _kmeans_ctes(k: int = _K, rounds: int = _ROUNDS, dims: int = _DIMS) -> str:
    """The Lloyd rounds as a chained-CTE body (the PageRank/BPE
    oracle discipline: same integer ops, same tie-breaks). Ends with
    `c{rounds}` (trained centroids) and `sF` (final assignment) for
    callers to build on."""
    parts = [
        f"""
    v AS (
      SELECT vec_id AS vid,
             list_transform(embedding,
               e -> CAST(round(CAST(e AS DOUBLE) * 1000000) AS BIGINT)) AS qv
      FROM embeddings),
    c0 AS (
      SELECT row_number() OVER (ORDER BY vid) - 1 AS cidx, qv AS cv
      FROM (SELECT vid, qv FROM v ORDER BY vid LIMIT {k}))"""
    ]

    def assign_cte(tag: str, cents: str) -> str:
        return f"""
    a{tag} AS (
      SELECT v.vid, c.cidx,
             CAST(list_sum(list_transform(list_zip(v.qv, c.cv),
                  p -> (p[1] - p[2]) * (p[1] - p[2]))) AS BIGINT) AS dist
      FROM v, {cents} c),
    s{tag} AS (
      SELECT vid, cidx AS cluster, dist
      FROM a{tag}
      QUALIFY row_number() OVER (PARTITION BY vid ORDER BY dist, cidx) = 1)"""

    for r in range(1, rounds + 1):
        parts.append(assign_cte(str(r), f"c{r - 1}"))
        parts.append(f"""
    u{r} AS (
      SELECT s{r}.cluster, d.pos,
             SUM(v.qv[d.pos + 1]) AS s, COUNT(*) AS c
      FROM s{r} JOIN v USING (vid), (SELECT unnest(range({dims})) AS pos) d
      GROUP BY s{r}.cluster, d.pos),
    c{r} AS (
      SELECT cluster AS cidx,
             list(CAST((s - ((s % c) + c) % c) // c AS BIGINT)
                  ORDER BY pos) AS cv
      FROM u{r} GROUP BY cluster)""")
    parts.append(assign_cte("F", f"c{rounds}"))
    return ",".join(parts)


def _kmeans_oracle(k: int = _K, rounds: int = _ROUNDS, dims: int = _DIMS) -> str:
    return f"""
    WITH {_kmeans_ctes(k, rounds, dims)}
    SELECT vid AS vec_id, CAST(cluster AS BIGINT) AS cluster,
           dist AS dist_sq
    FROM sF ORDER BY vec_id
    """


_L2 = (
    "CAST(list_sum(list_transform(list_zip({a}, {b}), "
    "p -> (p[1] - p[2]) * (p[1] - p[2]))) AS BIGINT)"
)


@query(
    "q_ann_ivf_kmeans",
    oracle=f"""
    WITH {_kmeans_ctes()},
    q AS (SELECT vid, qv FROM v WHERE vid < 10),
    qd AS (
      SELECT q.vid, c.cidx, {_L2.format(a="q.qv", b="c.cv")} AS dist
      FROM q, c{_ROUNDS} c
    ),
    qa AS (
      SELECT vid AS qid, cidx AS cell FROM qd
      QUALIFY row_number() OVER (PARTITION BY vid ORDER BY dist, cidx) <= 2
    ),
    pairs AS (
      SELECT qa.qid, s.vid AS vec_id, qa.cell,
             {_L2.format(a="qv.qv", b="cv.qv")} AS dist_sq
      FROM qa
      JOIN sF s ON s.cluster = qa.cell AND s.vid <> qa.qid
      JOIN v qv ON qv.vid = qa.qid
      JOIN v cv ON cv.vid = s.vid
    )
    SELECT qid, vec_id, CAST(cell AS BIGINT) AS cell, dist_sq FROM (
      SELECT *, row_number() OVER (
        PARTITION BY qid ORDER BY dist_sq, vec_id) AS rn
      FROM pairs
    ) WHERE rn <= 3 ORDER BY qid, vec_id
    """,
)
def q_ann_ivf_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF search over the TRAINED quantizer: the q_cluster_kmeans centroids
    replace ann_ivf's designated vectors (the quality upgrade a real
    IVF index ships), and because the whole pipeline — training,
    assignment, 2-probe search, top-3 ranking — runs in quantized
    int64 micros, there is no float anywhere: distances are exact and
    the full composition hash-checks. Scale shape: the index build is
    q_cluster_kmeans (constant-width shuffles); search joins candidates on
    the cell id only (never corpus x corpus); the 8-row centroid
    frame is persisted so the corpus assignment and the query probes
    share one trained DAG."""
    from pyspark.sql.window import Window as W

    emb = load_table(spark, sf_dir, "embeddings")
    # ONE persisted quantized corpus must feed training, corpus
    # assignment, query probes AND both sides of the distance join —
    # each consumer would otherwise re-scan and re-quantize.
    vecs = persisted_quantized(quantize_vectors(emb))
    cents = train_centroids(vecs, _K, _ROUNDS).persist()
    corpus_cells = assign(vecs, cents)
    probes = (
        assign_topn(vecs.filter(F.col("vid") < 10), cents, 2)
        .select(F.col("vid").alias("qid"), F.col("cidx").alias("cell"))
    )
    cand = corpus_cells.select("vid", F.col("cluster").alias("cell"))
    qv = vecs.select(F.col("vid").alias("qid"), F.col("qv").alias("qqv"))
    cv = vecs.select("vid", F.col("qv").alias("cqv"))
    dist = (
        "CAST(aggregate(zip_with(qqv, cqv, (x, y) -> (x - y) * (x - y)), "
        "CAST(0 AS BIGINT), (acc, d) -> acc + d) AS BIGINT)"
    )
    pairs = (
        probes.join(cand, "cell")
        .filter(F.col("qid") != F.col("vid"))
        .join(qv, "qid")
        .join(cv, "vid")
        .withColumn("dist_sq", F.expr(dist))
    )
    w = W.partitionBy("qid").orderBy("dist_sq", "vid")
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "qid",
            F.col("vid").alias("vec_id"),
            F.col("cell").cast("long").alias("cell"),
            "dist_sq",
        )
        .orderBy("qid", "vec_id")
    )


@query("q_cluster_kmeans", oracle=_kmeans_oracle())
def q_cluster_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lloyd k-means (k=8, 3 rounds) over the embeddings in integer
    micros — the training loop behind an IVF coarse quantizer, fully
    declarative and engine-exact (see operators/clustering.py for the
    determinism + 100 TB scale notes: per-round cost is one broadcast
    of k rows, one map-side argmin, one k×dims-wide update shuffle)."""
    emb = load_table(spark, sf_dir, "embeddings")
    out = lloyd_kmeans(emb, k=_K, rounds=_ROUNDS)
    return out.select(
        F.col("vid").alias("vec_id"),
        F.col("cluster").cast("long").alias("cluster"),
        F.col("dist_sq"),
    ).orderBy("vec_id")
