"""Training-example packing + corpus-composition audit queries
(LLM-pipeline superset).

- `q_doc_pack`: contiguous sequence packing — the pretraining "concat
  then chunk at CAP tokens" layout — as a distributed prefix sum plus
  a per-sequence audit aggregate (fill, doc count, boundary count).
- `q_domain_temp_mix`: temperature-weighted (alpha=0.5) domain sampling
  allocation, the multinomial-smoothing sibling of q_domain_mix's
  water-filling.
- `q_corpus_overlap`: pairwise source-overlap estimates from per-source
  KMV sketches — the cross-source contamination audit, computed on
  k-sized sketches, never on doc×doc pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from core_spark.io import load_table
from core_spark.plans.registry import query
from core_spark.plans.sketches import _DUCK_H60, _SPARK_H60

# ------------------------------------------------------- sequence packing
_CAP = 256  # tokens per packed training sequence
_PACK_BKT = 64  # prefix-sum buckets (top 6 bits of the 60-bit hash)


@query(
    "q_doc_pack",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n,
             {_DUCK_H60.format(x="'pack:' || CAST(doc_id AS VARCHAR)")} AS h
      FROM documents
    ),
    c AS (
      SELECT doc_id, n, h,
             SUM(n) OVER (ORDER BY h, doc_id
                          ROWS UNBOUNDED PRECEDING) AS cum
      FROM t
    ),
    e AS (
      SELECT u.seq,
             least(c.cum, (u.seq + 1) * {_CAP})
               - greatest(c.cum - c.n, u.seq * {_CAP}) AS tok,
             CASE WHEN c.cum - c.n >= u.seq * {_CAP} THEN 1 ELSE 0 END AS st
      FROM c, unnest(range(CAST((c.cum - c.n) // {_CAP} AS BIGINT),
                           CAST((c.cum - 1) // {_CAP} + 1 AS BIGINT))) u(seq)
    )
    SELECT CAST(seq AS BIGINT) AS seq_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(tok) AS BIGINT) AS n_tokens,
           CAST(SUM(st) AS BIGINT) AS n_starts
    FROM e GROUP BY seq ORDER BY seq_id
    """,
)
def q_doc_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contiguous sequence packing at CAP=256 tokens: documents are
    laid out in salted-hash order, token offsets come from a prefix
    sum, and each doc is charged to the training sequences its
    [start, end) token interval spans. Output is the per-sequence
    manifest (doc count, token fill — CAP everywhere but the tail —
    and how many docs *start* inside the sequence).

    Scale shape: the global cumsum is the q_budget_pack two-pass
    prefix sum (per-bucket window cumsums + a {_PACK_BKT}-row offset
    scan — never a corpus-wide single-task window); the span explode
    emits ceil(n/CAP) rows per doc (≈1 for normal docs); the final
    aggregate shuffles on seq_id, a dense integer key. The oracle is
    the collapsed single-window form."""
    docs = load_table(spark, sf_dir, "documents")
    salted = "concat('pack:', CAST(doc_id AS STRING))"
    t = docs.select(
        "doc_id",
        F.expr("CAST(size(split(text, ' ')) AS BIGINT)").alias("n"),
        F.expr(_SPARK_H60.format(x=salted)).alias("h"),
    ).withColumn("bkt", F.expr(f"CAST(h DIV {2**60 // _PACK_BKT} AS INT)"))
    offsets = (
        t.groupBy("bkt")
        .agg(F.sum("n").alias("bkt_tokens"))
        .select(
            "bkt",
            F.sum("bkt_tokens")
            .over(
                Window.orderBy("bkt").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            )
            .alias("off"),
        )
        .na.fill({"off": 0})
    )
    w = Window.partitionBy("bkt").orderBy("h", "doc_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    c = (
        t.withColumn("bkt_cum", F.sum("n").over(w))
        .join(F.broadcast(offsets), "bkt")
        .select("n", (F.col("off") + F.col("bkt_cum")).alias("cum"))
    )
    e = c.select(
        "n",
        "cum",
        F.explode(
            F.expr(f"sequence((cum - n) DIV {_CAP}, (cum - 1) DIV {_CAP})")
        ).alias("seq"),
    ).select(
        "seq",
        F.expr(
            f"least(cum, (seq + 1) * {_CAP}) - greatest(cum - n, seq * {_CAP})"
        ).alias("tok"),
        F.expr(f"CASE WHEN cum - n >= seq * {_CAP} THEN 1 ELSE 0 END").alias(
            "st"
        ),
    )
    return (
        e.groupBy(F.col("seq").cast("long").alias("seq_id"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("tok").cast("long").alias("n_tokens"),
            F.sum("st").cast("long").alias("n_starts"),
        )
        .orderBy("seq_id")
    )


# --------------------------------------------- temperature-weighted mixing
_MIX_BUDGET = 50_000  # tokens


@query(
    "q_domain_temp_mix",
    oracle=f"""
    WITH s AS (
      SELECT source,
             CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source
    ),
    w AS (
      SELECT source, n_tokens,
             CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) * 1000000)
                  AS BIGINT) AS weight_micro
      FROM s
    )
    SELECT source, n_tokens, weight_micro,
           CAST(weight_micro * {_MIX_BUDGET}
                // (SELECT SUM(weight_micro) FROM w) AS BIGINT)
             AS alloc_tokens
    FROM w ORDER BY source
    """,
)
def q_domain_temp_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-weighted domain allocation: each source's share of
    a {_MIX_BUDGET}-token budget is proportional to tokens^alpha with
    alpha=1/2 (the multilingual-pretraining smoothing rule) — the
    multinomial sibling of q_domain_mix's water-filling cap.

    Integer discipline: sqrt is a correctly-rounded IEEE op (exact in
    both engines), floored to micros immediately; the share is one
    integer cross-multiply, floor-divided. Overflow headroom:
    weight_micro ≤ 1e6·sqrt(corpus) — at 10^13 corpus tokens the
    product with a 10^6 budget needs ~2^83, so the 100 TB variant
    divides weights by a power of two first (noted, not needed at
    bench scales). Scale shape: one partial-aggregated corpus scan;
    everything after runs on rows-per-source."""
    docs = load_table(spark, sf_dir, "documents")
    s = docs.groupBy("source").agg(
        F.expr("CAST(SUM(size(split(text, ' '))) AS BIGINT)").alias(
            "n_tokens"
        )
    )
    w = s.withColumn(
        "weight_micro",
        F.expr(
            "CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) * 1000000) AS BIGINT)"
        ),
    )
    tot = w.agg(F.sum("weight_micro").alias("tot"))
    return (
        w.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_tokens",
            "weight_micro",
            F.expr(f"CAST(weight_micro * {_MIX_BUDGET} DIV tot AS BIGINT)").alias(
                "alloc_tokens"
            ),
        )
        .orderBy("source")
    )


# ------------------------------------------------- source overlap matrix
_OVL_K = 64
_OVL_SALT = 16


@query(
    "q_corpus_overlap",
    oracle=f"""
    WITH t AS (
      SELECT DISTINCT source,
             {_DUCK_H60.format(x="text")} AS h
      FROM documents
    ),
    bk AS (
      SELECT source, h FROM t
      QUALIFY row_number() OVER (PARTITION BY source ORDER BY h) <= {_OVL_K}
    ),
    sk AS (
      SELECT source, list(h ORDER BY h) AS sk FROM bk GROUP BY source
    ),
    p AS (
      SELECT a.source AS source_a, b.source AS source_b,
             list_sort(list_distinct(list_concat(a.sk, b.sk))) AS u,
             a.sk AS ska, b.sk AS skb
      FROM sk a JOIN sk b ON a.source < b.source
    ),
    est AS (
      SELECT source_a, source_b,
             least({_OVL_K}, len(u)) AS k_used,
             len(list_intersect(list_intersect(u[1:{_OVL_K}], ska), skb))
               AS n_common
      FROM p
    )
    SELECT source_a, source_b, CAST(k_used AS BIGINT) AS k_used,
           CAST(n_common AS BIGINT) AS n_common,
           CAST(n_common * 1000000 // k_used AS BIGINT) AS jaccard_micro
    FROM est ORDER BY source_a, source_b
    """,
)
def q_corpus_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise source-overlap audit from per-source KMV sketches:
    bottom-{_OVL_K} distinct content hashes per source, pairwise
    Jaccard estimated on the merged sketch (the standard KMV
    estimator: |x ∈ bottom-k(A∪B) : x ∈ A ∩ B| / k) in integer
    micros. Deterministic, so the approximation itself hash-checks.

    Scale shape: the corpus is touched once (distinct (source, hash)
    — a partial-aggregated shuffle); the bottom-k selection is the
    two-stage salted pattern (per-(source, salt) window, then a
    {_OVL_K}x{_OVL_SALT}-row final window per source — never a
    corpus-wide single-partition window); the pair join runs on one
    k-array row per source, so S sources cost S² sketch comparisons
    of {_OVL_K} values — independent of corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "source", F.expr(_SPARK_H60.format(x="text")).alias("h")
    ).distinct()
    w1 = Window.partitionBy("source", F.pmod("h", F.lit(_OVL_SALT))).orderBy(
        "h"
    )
    w2 = Window.partitionBy("source").orderBy("h")
    bk = (
        t.withColumn("rn", F.row_number().over(w1))
        .filter(F.col("rn") <= _OVL_K)
        .withColumn("rn2", F.row_number().over(w2))
        .filter(F.col("rn2") <= _OVL_K)
    )
    sk = bk.groupBy("source").agg(
        F.sort_array(F.collect_list("h")).alias("sk")
    )
    a = sk.select(F.col("source").alias("source_a"), F.col("sk").alias("ska"))
    b = sk.select(F.col("source").alias("source_b"), F.col("sk").alias("skb"))
    p = a.join(b, F.col("source_a") < F.col("source_b")).select(
        "source_a",
        "source_b",
        F.expr("array_sort(array_union(ska, skb))").alias("u"),
        "ska",
        "skb",
    )
    est = p.select(
        "source_a",
        "source_b",
        F.expr(f"CAST(least({_OVL_K}, size(u)) AS BIGINT)").alias("k_used"),
        F.expr(
            f"CAST(size(array_intersect(array_intersect("
            f"slice(u, 1, {_OVL_K}), ska), skb)) AS BIGINT)"
        ).alias("n_common"),
    )
    return est.select(
        "source_a",
        "source_b",
        "k_used",
        "n_common",
        F.expr("CAST(n_common * 1000000 DIV k_used AS BIGINT)").alias(
            "jaccard_micro"
        ),
    ).orderBy("source_a", "source_b")


# ----------------------------------------------- epoch training order
_N_EPOCHS = 2


@query(
    "q_curriculum_order",
    oracle=f"""
    WITH t AS (
      SELECT e.epoch, d.doc_id,
             {_DUCK_H60.format(
                 x="'epoch' || CAST(e.epoch AS VARCHAR) || ':' "
                   "|| CAST(d.doc_id AS VARCHAR)")} AS h
      FROM documents d,
           (SELECT unnest(range({_N_EPOCHS})) AS epoch) e
    )
    SELECT CAST(epoch AS BIGINT) AS epoch, doc_id,
           CAST(row_number() OVER (PARTITION BY epoch ORDER BY h, doc_id)
                - 1 AS BIGINT) AS pos
    FROM t ORDER BY epoch, pos
    """,
)
def q_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-epoch training order: each epoch is an
    independent salted-hash permutation of the corpus, materialized
    as a DENSE global position (epoch, doc_id, pos) — the
    reproducible "global shuffle each epoch" every training run
    needs, recomputable from (epoch, doc_id) alone.

    The dense rank is the two-pass prefix-sum generalized from sums
    to ranks: per-(epoch, bucket) row_numbers plus exclusive
    bucket-count offsets (the only single-task step scans
    {_N_EPOCHS}x{_PACK_BKT} count rows) — never a corpus-wide
    single-partition window. The oracle is the collapsed per-epoch
    window form."""
    docs = load_table(spark, sf_dir, "documents")
    epochs = spark.range(_N_EPOCHS).select(F.col("id").alias("epoch"))
    salted = "concat('epoch', CAST(epoch AS STRING), ':', CAST(doc_id AS STRING))"
    t = (
        docs.select("doc_id")
        .crossJoin(F.broadcast(epochs))
        .select("epoch", "doc_id", F.expr(_SPARK_H60.format(x=salted)).alias("h"))
        .withColumn("bkt", F.expr(f"CAST(h DIV {2**60 // _PACK_BKT} AS INT)"))
    )
    offsets = (
        t.groupBy("epoch", "bkt")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "epoch",
            "bkt",
            F.sum("n")
            .over(
                Window.partitionBy("epoch")
                .orderBy("bkt")
                .rowsBetween(Window.unboundedPreceding, -1)
            )
            .alias("off"),
        )
        .na.fill({"off": 0})
    )
    w = Window.partitionBy("epoch", "bkt").orderBy("h", "doc_id")
    return (
        t.withColumn("rn", F.row_number().over(w))
        .join(F.broadcast(offsets), ["epoch", "bkt"])
        .select(
            F.col("epoch").cast("long").alias("epoch"),
            "doc_id",
            (F.col("off") + F.col("rn") - 1).cast("long").alias("pos"),
        )
        .orderBy("epoch", "pos")
    )
