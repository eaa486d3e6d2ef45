"""Similarity search over embedding columns (array<float>).

Two tiers, mirroring what a 100 TB training-data pipeline needs:

- `knn_bruteforce`: exact cosine top-k — the correctness baseline.
  Query set broadcast against the corpus; dot products are pure
  `aggregate`/`zip_with` column expressions (JVM codegen, no UDF).
  Cost O(|Q| x |corpus|): only for small query sets / verification.

- `ann_lsh`: random-hyperplane LSH (sign-random-projection). Each
  vector gets a `bucket` = packed signs of `n_planes` fixed ±1
  hyperplanes; the query joins only its bucket — the shuffle is keyed
  on the bucket id, so the corpus is never all-paired. Recall is tuned
  by n_planes (fewer planes → bigger buckets → higher recall/cost).
  The hyperplanes are a deterministic literal (seeded off-engine) so
  results are reproducible and oracle-checkable.

- `ann_ivf`: inverted-file index (IVF) with a deterministic coarse
  quantizer. Centroids are designated corpus vectors (lowest ids)
  rather than k-means-trained ones: Lloyd iterations average floats,
  and float summation order differs across engines/partitionings, so
  trained centroids would make results non-reproducible — the
  engine-exact alternative keeps every IVF *search* property (cell
  assignment by nearest centroid as a broadcast argmax, inverted
  lists keyed by cell, multi-probe queries) while staying
  oracle-checkable. Swapping in k-means centroids is a drop-in
  `centroids` DataFrame.

Float discipline: dot products computed in double, cosine rounded to 6
decimals *before* ranking, ties broken by vec_id — so ranking is
stable across engines and summation orders.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

SPARK_DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
    "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
)
SPARK_NORM = (
    "sqrt(aggregate(transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), "
    "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v))"
)


def hyperplanes(n_planes: int, dims: int, seed: str = "hp") -> list[list[int]]:
    """Deterministic ±1 hyperplanes from md5 — identical off-engine
    constant for Spark and any oracle."""
    planes = []
    for p in range(n_planes):
        row = []
        for i in range(dims):
            h = hashlib.md5(f"{seed}:{p}:{i}".encode()).hexdigest()
            row.append(1 if int(h[:8], 16) % 2 == 1 else -1)
        planes.append(row)
    return planes


def cosine_sim_expr(a: str, b: str) -> str:
    """Spark SQL expr: cosine similarity rounded to 6 decimals."""
    dot = SPARK_DOT.format(a=a, b=b)
    na = SPARK_NORM.format(a=a)
    nb = SPARK_NORM.format(a=b)
    return f"round({dot} / ({na} * {nb}), 6)"


def knn_bruteforce(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: (qid, vec_id, sim), self-pairs excluded."""
    q = queries.select(
        F.col(id_col).alias("qid"), F.col(vec_col).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("cv")
    )
    pairs = q.join(F.broadcast(c), F.col("qid") != F.col("vec_id")).select(
        "qid", "vec_id", F.expr(cosine_sim_expr("qv", "cv")).alias("sim")
    )
    w = W.partitionBy("qid").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def bucket_expr(vec_col: str, planes: list[list[int]]) -> str:
    """Spark SQL expr packing hyperplane signs into a bucket id."""
    terms = []
    for p, row in enumerate(planes):
        arr = "array(" + ", ".join(f"{w}D" for w in row) + ")"
        dot = SPARK_DOT.format(a=vec_col, b=arr)
        terms.append(f"(CASE WHEN {dot} > 0 THEN {1 << p} ELSE 0 END)")
    return " + ".join(terms)


def ann_lsh(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 3,
    n_planes: int = 8,
    dims: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k within the query's LSH bucket.

    Output: (qid, vec_id, bucket, sim)."""
    planes = hyperplanes(n_planes, dims)
    q = queries.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qv"))
    q = q.withColumn("bucket", F.expr(bucket_expr("qv", planes)))
    c = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("cv"))
    c = c.withColumn("bucket", F.expr(bucket_expr("cv", planes)))
    pairs = q.join(c, ["bucket"]).filter(F.col("qid") != F.col("vec_id")).select(
        "qid",
        "vec_id",
        "bucket",
        F.expr(cosine_sim_expr("qv", "cv")).alias("sim"),
    )
    w = W.partitionBy("qid").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def ann_ivf(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 3,
    n_cells: int = 16,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: nearest-centroid cell assignment
    (broadcast argmax over `n_cells` designated centroids — map-side,
    the corpus is never all-paired), inverted lists keyed by cell,
    queries probing their `nprobe` nearest cells.

    Cell assignment uses the same rounded-cosine + id tie-break
    discipline as ranking, so it is engine-deterministic. The corpus
    side is one max_by aggregate (partial map-side combine: the
    n_cells candidate rows of a vector collapse before the shuffle);
    the candidate join shuffles on the cell id only.

    Output: (qid, vec_id, cell, sim)."""
    cents = corpus.orderBy(id_col).limit(n_cells).select(
        F.col(id_col).alias("cent_id"), F.col(vec_col).alias("cent_v")
    )

    def assign(df, out_id, top_n):
        sims = (
            df.join(F.broadcast(cents))
            .select(
                F.col(out_id),
                "cent_id",
                F.expr(cosine_sim_expr("_v", "cent_v")).alias("csim"),
            )
        )
        if top_n == 1:
            return sims.groupBy(out_id).agg(
                F.max_by(
                    "cent_id", F.struct(F.col("csim"), -F.col("cent_id"))
                ).alias("cell")
            )
        w = W.partitionBy(out_id).orderBy(F.desc("csim"), F.asc("cent_id"))
        return (
            sims.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= top_n)
            .select(out_id, F.col("cent_id").alias("cell"))
        )

    c = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_v"))
    c_cells = assign(c, "vec_id", 1)
    inverted = c.join(c_cells, "vec_id").select(
        "vec_id", F.col("_v").alias("cv"), "cell"
    )

    q = queries.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("_v"))
    q_cells = assign(q, "qid", nprobe)
    probes = q.join(q_cells, "qid").select("qid", F.col("_v").alias("qv"), "cell")

    pairs = (
        probes.join(inverted, "cell")
        .filter(F.col("qid") != F.col("vec_id"))
        .select(
            "qid", "vec_id", "cell", F.expr(cosine_sim_expr("qv", "cv")).alias("sim")
        )
    )
    w = W.partitionBy("qid").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )
