"""Clustering-tier declared queries (LLM-pipeline superset).

`q_kmeans` is the fourth fully-declarative iterative algorithm beside
connected components, PageRank and BPE training: Lloyd k-means whose
every round is engine-exact integer arithmetic, so the oracle (the
same rounds unrolled as chained CTEs) hash-matches the assignments —
not just the row counts — of an iterative float-free clustering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from core_spark.io import load_table
from core_spark.operators.clustering import lloyd_kmeans
from core_spark.plans.registry import query

_K = 8
_ROUNDS = 3
_DIMS = 64


def _kmeans_oracle(k: int = _K, rounds: int = _ROUNDS, dims: int = _DIMS) -> str:
    """Unroll the Lloyd rounds as chained CTEs (the PageRank/BPE
    oracle discipline: same integer ops, same tie-breaks)."""
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
    body = ",".join(parts)
    return f"""
    WITH {body}
    SELECT vid AS vec_id, CAST(cluster AS BIGINT) AS cluster,
           dist AS dist_sq
    FROM sF ORDER BY vec_id
    """


@query("q_kmeans", oracle=_kmeans_oracle())
def q_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
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
