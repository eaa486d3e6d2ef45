"""Corpus ranking: TF-IDF term extraction and BM25 retrieval over the
`documents` table — the indexing/retrieval half of a training-data
pipeline (the reference's prefix-scan query API,
examples/word-count/word_count.go:222-278, is a served materialized
index; these are the ranking functions a corpus index serves).

Float discipline: both scores are computed in integer arithmetic
(reciprocal-df idf in milli/micro units, BM25's k1=1.2 / b=0.75 as the
exact rationals 6/5 and 3/4 cross-multiplied away), so results are
bit-identical on any engine and any partitioning — log-based idf would
hash-differ across libm implementations.

Scale shape (100 TB): one corpus explode feeds tf; df and the global
(S, N) scalars are vocabulary-/constant-sized aggregates broadcast
back; the only corpus-sized shuffles are the (doc, term) tf aggregate
and the per-doc window/top-k. No all-pairs, no driver materialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from core_spark.io import load_table
from core_spark.plans.registry import query

# ---------------------------------------------------------------- tf-idf
@query(
    "q_doc_tfidf",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    tf AS (
      SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
      FROM toks GROUP BY doc_id, term
    ),
    df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term, tf.tf,
             tf.tf * ((n.n * 1000000) // df.df) AS score
      FROM tf JOIN df USING (term) CROSS JOIN n
    )
    SELECT doc_id, term, tf, score FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY doc_id ORDER BY score DESC, term) AS rn
      FROM scored
    ) WHERE rn <= 3 ORDER BY doc_id, term
    """,
)
def q_doc_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document. idf is the reciprocal-df ratio
    in micros, `(N * 1e6) DIV df` — integer-exact (see module doc);
    score = tf * idf_micro; ties broken by term.

    Plan: explode → (doc, term) partial/final count (tf) → term-keyed
    count over tf (df, vocabulary-sized, broadcast back) → per-doc
    ranking window. The df broadcast means the corpus-sized side never
    re-shuffles for the join."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(
        F.count("*").cast("bigint").alias("tf")
    )
    df_ = tf.groupBy("term").agg(F.count("*").cast("bigint").alias("df"))
    n = docs.agg(F.count("*").cast("bigint").alias("n"))
    scored = (
        tf.join(F.broadcast(df_), "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            "tf",
            F.expr("tf * ((n * 1000000) DIV df)").alias("score"),
        )
    )
    w = W.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .drop("rn")
        .orderBy("doc_id", "term")
    )


# ----------------------------------------------------------------- bm25
_BM25_TERMS = ("spark", "join", "window", "data")


@query(
    "q_bm25",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl
           FROM toks GROUP BY doc_id),
    g AS (SELECT CAST(SUM(dl) AS BIGINT) AS s, CAST(COUNT(*) AS BIGINT) AS n
          FROM dl),
    tf AS (
      SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
      FROM toks
      WHERE term IN {_BM25_TERMS!r}
      GROUP BY doc_id, term
    ),
    df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
    scored AS (
      SELECT tf.doc_id,
             CAST(SUM(
               ((((g.n - df.df + 1) * 1000) // (df.df + 1)) * 22 * tf.tf * g.s)
               // ((10 * tf.tf * g.s) + (3 * g.s) + (9 * dl.dl * g.n))
             ) AS BIGINT) AS score
      FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN g
      GROUP BY tf.doc_id
    )
    SELECT doc_id, score FROM scored
    ORDER BY score DESC, doc_id LIMIT 10
    """,
)
def q_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-10 documents for the fixed query {spark, join, window,
    data}. With k1 = 6/5 and b = 3/4 the per-term score
    idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)), avgdl = S/N,
    cross-multiplies to the exact integer form
        (idf_milli * 22 * tf * S) DIV (10*tf*S + 3*S + 9*dl*N)
    with idf_milli = ((N - df + 1) * 1000) DIV (df + 1) — the
    Robertson ratio without the log (module doc). Milli (not micro)
    idf keeps the worst-case product inside int64 through sf 1.

    Plan: tf is corpus-exploded but filtered to the query terms before
    aggregation (the scan's pushed predicate makes this the classic
    term-at-a-time retrieval shape); df and the (S, N) scalars are
    tiny broadcasts; top-10 is TakeOrderedAndProject, never a global
    sort."""
    docs = load_table(spark, sf_dir, "documents")
    return bm25_scores(docs, _BM25_TERMS).orderBy(
        F.desc("score"), F.asc("doc_id")
    ).limit(10)


def bm25_scores(docs: DataFrame, terms: tuple[str, ...]) -> DataFrame:
    """BM25 scores (doc_id, score) for every document matching at
    least one query term — the reusable core of q_bm25 (integer form
    and plan shape in its docstring), also the lexical leg of
    q_fusion_rank."""
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    )
    dl = toks.groupBy("doc_id").agg(F.count("*").cast("bigint").alias("dl"))
    g = dl.agg(
        F.sum("dl").cast("bigint").alias("s"),
        F.count("*").cast("bigint").alias("n"),
    )
    tf = (
        toks.filter(F.col("term").isin(*terms))
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("bigint").alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count("*").cast("bigint").alias("df"))
    return (
        tf.join(F.broadcast(df_), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(g))
        .select(
            "doc_id",
            F.expr(
                "((((n - df + 1) * 1000) DIV (df + 1)) * 22 * tf * s)"
                " DIV ((10 * tf * s) + (3 * s) + (9 * dl * n))"
            ).alias("tscore"),
        )
        .groupBy("doc_id")
        .agg(F.sum("tscore").cast("bigint").alias("score"))
    )


# ------------------------------------------------------------ fusion rank
#
# Hybrid retrieval: the lexical (BM25) and vector (cosine-to-query-
# embedding) top-K lists fused by reciprocal-rank fusion,
#     fused(d) = sum over lists containing d of 1000 DIV (60 + rank)
# (Cormack et al. 2009's RRF with the standard k = 60, scaled to an
# exact integer). The two retrievers run their native scale shapes
# (term-at-a-time BM25; broadcast-query cosine scan); ranking windows
# run AFTER each list's top-K cut, so they scan K-row frames, never
# the corpus.
_FUSION_K = 50
_FUSION_QVEC = 0  # query = embedding of vec_id 0


@query(
    "q_fusion_rank",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl
           FROM toks GROUP BY doc_id),
    g AS (SELECT CAST(SUM(dl) AS BIGINT) AS s, CAST(COUNT(*) AS BIGINT) AS n
          FROM dl),
    tf AS (
      SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
      FROM toks
      WHERE term IN {_BM25_TERMS!r}
      GROUP BY doc_id, term
    ),
    df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
    scored AS (
      SELECT tf.doc_id,
             CAST(SUM(
               ((((g.n - df.df + 1) * 1000) // (df.df + 1)) * 22 * tf.tf * g.s)
               // ((10 * tf.tf * g.s) + (3 * g.s) + (9 * dl.dl * g.n))
             ) AS BIGINT) AS score
      FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN g
      GROUP BY tf.doc_id
    ),
    lex AS (SELECT doc_id, score FROM scored
            ORDER BY score DESC, doc_id LIMIT {_FUSION_K}),
    lexr AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id)
                      AS lex_rank FROM lex),
    e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    q AS (SELECT v AS qv FROM e WHERE vec_id = {_FUSION_QVEC}),
    sims AS (
      SELECT vec_id AS doc_id, {{cos}} AS sim
      FROM e, q WHERE vec_id <> {_FUSION_QVEC}
    ),
    vec AS (SELECT doc_id, sim FROM sims
            ORDER BY sim DESC, doc_id LIMIT {_FUSION_K}),
    vecr AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY sim DESC, doc_id)
                      AS vec_rank FROM vec),
    fused AS (
      SELECT COALESCE(l.doc_id, v.doc_id) AS doc_id,
             CAST(COALESCE(l.lex_rank, 0) AS BIGINT) AS lex_rank,
             CAST(COALESCE(v.vec_rank, 0) AS BIGINT) AS vec_rank,
             CAST(COALESCE(1000 // (60 + l.lex_rank), 0)
                + COALESCE(1000 // (60 + v.vec_rank), 0) AS BIGINT) AS fused
      FROM lexr l FULL OUTER JOIN vecr v ON l.doc_id = v.doc_id
    )
    SELECT doc_id, lex_rank, vec_rank, fused
    FROM fused ORDER BY fused DESC, doc_id LIMIT 10
    """.replace("{cos}", "round(list_sum(list_transform(range(1, len(e.v) + 1), i -> e.v[i] * qv[i])) / (sqrt(list_sum(list_transform(e.v, y -> y * y))) * sqrt(list_sum(list_transform(qv, y -> y * y)))), 6)"),
)
def q_fusion_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval with reciprocal-rank fusion (module comment):
    BM25 top-50 for the fixed term query fused with cosine top-50
    against the query embedding (vec_id 0), fused = Σ 1000 DIV
    (60 + rank), top-10. Rank 0 marks absence from a list.

    Scale shape: each retriever keeps its own declared plan (q_bm25's
    term-at-a-time aggregate; a broadcast one-row query vector over
    the embeddings scan with TakeOrderedAndProject); the ranking
    windows and the full-outer fuse run on the two 50-row retrieved
    lists — post-retrieval frames, never the corpus."""
    from core_spark.operators.similarity import cosine_sim_expr

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")

    lex = (
        bm25_scores(docs, _BM25_TERMS)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(_FUSION_K)
    )
    lexr = lex.select(
        "doc_id",
        F.row_number()
        .over(W.orderBy(F.desc("score"), F.asc("doc_id")))
        .alias("lex_rank"),
    )

    qv = emb.filter(F.col("vec_id") == _FUSION_QVEC).select(
        F.col("embedding").alias("qv")
    )
    sims = (
        emb.filter(F.col("vec_id") != _FUSION_QVEC)
        .crossJoin(F.broadcast(qv))
        .select(
            F.col("vec_id").alias("doc_id"),
            F.expr(cosine_sim_expr("embedding", "qv")).alias("sim"),
        )
    )
    vec = sims.orderBy(F.desc("sim"), F.asc("doc_id")).limit(_FUSION_K)
    vecr = vec.select(
        "doc_id",
        F.row_number()
        .over(W.orderBy(F.desc("sim"), F.asc("doc_id")))
        .alias("vec_rank"),
    )

    zero = F.lit(0).cast("bigint")
    fused = (
        lexr.join(vecr, "doc_id", "full_outer")
        .select(
            "doc_id",
            F.coalesce(F.col("lex_rank").cast("bigint"), zero).alias(
                "lex_rank"
            ),
            F.coalesce(F.col("vec_rank").cast("bigint"), zero).alias(
                "vec_rank"
            ),
            (
                F.coalesce(
                    F.expr("CAST(1000 DIV (60 + lex_rank) AS BIGINT)"), zero
                )
                + F.coalesce(
                    F.expr("CAST(1000 DIV (60 + vec_rank) AS BIGINT)"), zero
                )
            ).alias("fused"),
        )
    )
    return fused.orderBy(F.desc("fused"), "doc_id").limit(10)
