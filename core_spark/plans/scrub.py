"""Corpus scrubbing & shaping declared queries: PII redaction,
document chunking, corpus-level n-gram statistics, stratified
sampling, and per-stratum token distribution stats.

These extend the curation tier (plans/curation.py) with the remaining
passes a training-data pipeline runs between dedup and tokenization:
scrub sensitive spans, cut documents into model-context-sized chunks,
inspect corpus vocabulary, and rebalance strata. All are pure
DataFrame/SQL compositions with value-identical DuckDB oracles.

Scale notes (100 TB):
- PII redaction: map-side only (regexp over each row, no shuffle);
  the three patterns run as one projection so the scan is read once.
- chunking: map-side explode of a per-doc `sequence(0, n_chunks-1)` —
  output rows ~= corpus_tokens/stride, but nothing is shuffled and
  nothing is wider than one chunk; the md5 keeps chunk payloads out
  of the comparison surface.
- n-gram top-k: explode -> two-level aggregate; partial aggregation
  absorbs the explode map-side, and the final top-k is
  TakeOrderedAndProject (no global sort materialized).
- sampling: a salted-hash filter — a projection, recomputable by any
  reader, no membership table, no shuffle.
- token stats: exact per-stratum median needs a per-stratum sort; the
  stratum key (lang) is low-cardinality, so the window runs one task
  per stratum — fine for an analysis query. The 100 TB production
  variant is `approx_percentile` (map-side sketch, no sort), which we
  don't declare because approximation isn't oracle-stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from core_spark.io import load_table
from core_spark.plans.registry import query

# ------------------------------------------------------------- pii redact
# The synthetic corpus carries no PII, so the query first plants
# deterministic spans (email / IPv4 / phone keyed on doc_id) and then
# scrubs them — the redaction logic sees realistic text and the oracle
# can rebuild the identical input. Patterns stay in the Java-regex ∩
# RE2 subset (no lookaround, no backrefs) so Spark and DuckDB agree.
_EMAIL_RE = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
_IPV4_RE = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
_PHONE_RE = "\\b\\d{3}-\\d{3}-\\d{4}\\b"


def _duck_planted(alias: str = "planted") -> str:
    return f"""
    {alias} AS (
      SELECT doc_id,
             text
             || CASE WHEN doc_id % 3 = 0
                     THEN ' contact user' || CAST(doc_id % 50 AS VARCHAR)
                          || '@example.com'
                     ELSE '' END
             || CASE WHEN doc_id % 5 = 0
                     THEN ' from 10.' || CAST(doc_id % 256 AS VARCHAR)
                          || '.0.' || CAST(doc_id % 100 AS VARCHAR)
                     ELSE '' END
             || CASE WHEN doc_id % 7 = 0
                     THEN ' call ' || CAST(100 + doc_id % 900 AS VARCHAR)
                          || '-555-' || CAST(1000 + doc_id % 9000 AS VARCHAR)
                     ELSE '' END AS text
      FROM documents
    )
"""


@query(
    "q_pii_redact",
    oracle=f"""
    WITH {_duck_planted()}
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{_EMAIL_RE}')) AS BIGINT)
             AS n_email,
           CAST(len(regexp_extract_all(text, '{_IPV4_RE}')) AS BIGINT)
             AS n_ip,
           CAST(len(regexp_extract_all(text, '{_PHONE_RE}')) AS BIGINT)
             AS n_phone,
           md5(regexp_replace(regexp_replace(regexp_replace(text,
                 '{_EMAIL_RE}', '<EMAIL>', 'g'),
                 '{_IPV4_RE}', '<IP>', 'g'),
                 '{_PHONE_RE}', '<PHONE>', 'g')) AS red_hash
    FROM planted ORDER BY doc_id
    """,
)
def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing: count and redact email / IPv4 / phone spans with
    one map-side projection (plant deterministic spans first — the
    synthetic corpus has none). Redaction order is email -> IP ->
    phone so the IP pattern can't eat an address inside an email
    host. Output carries md5 of the redacted text, keeping payloads
    out of the hash-compare surface."""
    docs = load_table(spark, sf_dir, "documents")
    planted = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(
                    F.lit(" contact user"),
                    (F.col("doc_id") % 50).cast("string"),
                    F.lit("@example.com"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 5 == 0,
                F.concat(
                    F.lit(" from 10."),
                    (F.col("doc_id") % 256).cast("string"),
                    F.lit(".0."),
                    (F.col("doc_id") % 100).cast("string"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 7 == 0,
                F.concat(
                    F.lit(" call "),
                    (100 + F.col("doc_id") % 900).cast("string"),
                    F.lit("-555-"),
                    (1000 + F.col("doc_id") % 9000).cast("string"),
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    red = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), _EMAIL_RE, "<EMAIL>"),
            _IPV4_RE,
            "<IP>",
        ),
        _PHONE_RE,
        "<PHONE>",
    )
    return planted.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(_EMAIL_RE), F.lit(0)))
        .cast("bigint")
        .alias("n_email"),
        F.size(F.regexp_extract_all("text", F.lit(_IPV4_RE), F.lit(0)))
        .cast("bigint")
        .alias("n_ip"),
        F.size(F.regexp_extract_all("text", F.lit(_PHONE_RE), F.lit(0)))
        .cast("bigint")
        .alias("n_phone"),
        F.md5(red).alias("red_hash"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------- chunking
_CHUNK = 32  # tokens per chunk (model context unit)
_STRIDE = 24  # tokens advanced per chunk (8-token overlap)


@query(
    "q_chunk",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks,
             len(string_split(text, ' ')) AS n
      FROM documents
    ),
    shaped AS (
      SELECT doc_id, toks,
             CASE WHEN n <= {_CHUNK} THEN 1
                  ELSE 1 + CAST(CEIL((n - {_CHUNK}) / {_STRIDE}.0) AS BIGINT)
             END AS n_chunks
      FROM t
    )
    SELECT doc_id,
           ci AS chunk_id,
           CAST(len(toks[ci * {_STRIDE} + 1 : ci * {_STRIDE} + {_CHUNK}])
                AS BIGINT) AS chunk_tokens,
           md5(array_to_string(
                 toks[ci * {_STRIDE} + 1 : ci * {_STRIDE} + {_CHUNK}], ' '))
             AS chunk_hash
    FROM shaped, (SELECT unnest(range(0, 10000)) AS ci)
    WHERE ci < n_chunks
    ORDER BY doc_id, chunk_id
    """,
)
def q_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document chunking: cut each document into 32-token windows
    advancing 24 tokens (8-token overlap) — the standard pretraining
    packing pass. Map-side explode of `sequence(0, n_chunks-1)`; each
    output row carries the chunk's md5, not its text, so the result
    stays narrow. Chunk count = 1 + ceil((n-32)/24) for n > 32."""
    docs = load_table(spark, sf_dir, "documents")
    # Materialize toks before the lambda slices into it (the aliased-
    # array re-inline trap, operators/dedup.py:_with_shingles).
    t = docs.select("doc_id", F.split("text", " ").alias("toks")).select(
        "doc_id",
        "toks",
        F.expr(
            f"CASE WHEN size(toks) <= {_CHUNK} THEN 1 "
            f"ELSE 1 + CAST(CEIL((size(toks) - {_CHUNK}) / {_STRIDE}.0) AS BIGINT) "
            "END"
        ).alias("n_chunks"),
    )
    return (
        t.select(
            "doc_id",
            "toks",
            F.explode(F.expr("sequence(0, n_chunks - 1)")).alias("ci"),
        )
        .select(
            "doc_id",
            F.col("ci").alias("chunk_id"),
            F.expr(f"CAST(size(slice(toks, ci * {_STRIDE} + 1, {_CHUNK})) AS BIGINT)")
            .alias("chunk_tokens"),
            F.expr(
                f"md5(array_join(slice(toks, ci * {_STRIDE} + 1, {_CHUNK}), ' '))"
            ).alias("chunk_hash"),
        )
        .orderBy("doc_id", "chunk_id")
    )


# ------------------------------------------------------------ n-gram top-k
@query(
    "q_ngram_topk",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ),
    tg AS (
      SELECT unnest(list_transform(
               range(1, greatest(len(toks) - 1, 1)),
               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS ngram
      FROM t
    )
    SELECT ngram, COUNT(*) AS n
    FROM tg GROUP BY ngram
    ORDER BY n DESC, ngram ASC LIMIT 20
    """,
)
def q_ngram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level vocabulary statistics: the 20 most frequent word
    trigrams (count desc, ngram asc tie-break). Explode -> aggregate
    with map-side partial combine; the top-k compiles to
    TakeOrderedAndProject, so no global sort is materialized."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(F.split("text", " ").alias("toks"))
    tg = t.select(
        F.explode(
            F.expr(
                "CASE WHEN size(toks) >= 3 THEN "
                "transform(sequence(0, size(toks) - 3), "
                "i -> concat(toks[i], ' ', toks[i+1], ' ', toks[i+2])) "
                "ELSE array() END"
            )
        ).alias("ngram")
    )
    return (
        tg.groupBy("ngram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("ngram").asc())
        .limit(20)
    )


# ------------------------------------------------------------- sampling
# Stratified downsampling: the dominant language is kept at 10%, the
# rest at 50% — the standard corpus-rebalancing move. Salted hash of
# the stable key, so membership is recomputable and independent of
# every other md5-keyed operator.
_SPARK_SAMP = (
    "CAST(conv(substring(md5(concat('sample:', CAST(doc_id AS STRING))), 1, 8), "
    "16, 10) AS BIGINT) % 100"
)
_DUCK_SAMP = (
    "CAST('0x' || substr(md5('sample:' || CAST(doc_id AS VARCHAR)), 1, 8) "
    "AS BIGINT) % 100"
)


@query(
    "q_sample",
    oracle=f"""
    SELECT doc_id, lang, {_DUCK_SAMP} AS bucket
    FROM documents
    WHERE {_DUCK_SAMP} < CASE WHEN lang = 'en' THEN 10 ELSE 50 END
    ORDER BY doc_id
    """,
)
def q_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: keep 10% of the dominant
    stratum (en) and 50% of the rest via a salted md5 bucket on the
    stable key. A pure filter-projection — no shuffle, no stored
    membership, any job recomputes the same sample."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = F.expr(_SPARK_SAMP)
    rate = F.when(F.col("lang") == "en", F.lit(10)).otherwise(F.lit(50))
    return (
        docs.filter(bucket < rate)
        .select("doc_id", "lang", bucket.alias("bucket"))
        .orderBy("doc_id")
    )


# ---------------------------------------------------------- exact quota
_QUOTA_K = 25  # docs kept per stratum
_QUOTA_B = 16  # stage-1 salt buckets per stratum

_SPARK_QH = (
    "CAST(conv(substring(md5(concat('quota:', CAST(doc_id AS STRING))), 1, 15), "
    "16, 10) AS BIGINT)"
)
_DUCK_QH = (
    "CAST('0x' || substr(md5('quota:' || CAST(doc_id AS VARCHAR)), 1, 15) "
    "AS BIGINT)"
)


@query(
    "q_exact_quota",
    oracle=f"""
    WITH r AS (
      SELECT doc_id, lang, {_DUCK_QH} AS pri,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY {_DUCK_QH}, doc_id) AS rk
      FROM documents
    )
    SELECT doc_id, lang, pri, rk FROM r WHERE rk <= {_QUOTA_K}
    ORDER BY doc_id
    """,
)
def q_exact_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-quota stratified sampling: keep exactly K documents per
    stratum, chosen deterministically by salted-hash priority (the
    rate-based q_sample can only hit a quota in expectation; dataset
    curation and eval-split carving need exact counts).

    The naive form is one window per stratum — with a handful of
    strata that is a handful of tasks holding the corpus (the
    straggler shape DESIGN.md §2 bans). This is the two-stage
    top-K instead: stage 1 ranks within (stratum, hash-salt bucket) —
    uniform parallel width — and keeps at most K per bucket, so at
    most K*B candidate rows per stratum survive; stage 2 re-ranks
    only those candidates per stratum. Any row stage 2 keeps has
    stratum-wide rank <= K, and every stratum-wide top-K row is in
    its bucket's top-K, so the two-stage result is exactly the
    single-window result — the oracle IS the single window.
    """
    docs = load_table(spark, sf_dir, "documents")
    pri = F.expr(_SPARK_QH)
    staged = docs.select("doc_id", "lang", pri.alias("pri")).withColumn(
        "bkt", F.col("pri") % _QUOTA_B
    )
    w1 = Window.partitionBy("lang", "bkt").orderBy("pri", "doc_id")
    cand = (
        staged.withColumn("rk1", F.row_number().over(w1))
        .filter(F.col("rk1") <= _QUOTA_K)
        .drop("rk1", "bkt")
    )
    w2 = Window.partitionBy("lang").orderBy("pri", "doc_id")
    return (
        cand.withColumn("rk", F.row_number().over(w2))
        .filter(F.col("rk") <= _QUOTA_K)
        .orderBy("doc_id")
    )


# ------------------------------------------------------------ token stats
@query(
    "q_doc_token_stats",
    oracle="""
    WITH t AS (
      SELECT doc_id, lang,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n
      FROM documents
    ),
    r AS (
      SELECT lang, doc_id, n,
             ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n, doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY lang) AS cnt
      FROM t
    )
    SELECT lang,
           MAX(cnt) AS n_docs,
           CAST(SUM(n) AS BIGINT) AS total_tokens,
           MIN(n) AS min_tokens,
           MAX(n) AS max_tokens,
           CAST(SUM(CASE WHEN rn = (cnt + 1) // 2 THEN n ELSE 0 END)
                + SUM(CASE WHEN rn = (cnt + 2) // 2 THEN n ELSE 0 END)
                AS BIGINT) AS median_x2,
           CAST(SUM(CASE WHEN rn = (9 * cnt + 9) // 10 THEN n ELSE 0 END)
                AS BIGINT) AS p90_tokens
    FROM r GROUP BY lang ORDER BY lang
    """,
)
def q_doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language token-count distribution: doc count, totals,
    min/max, exact median (reported as the sum of the two middle
    ranks — integer, so no interpolation float can diverge between
    engines) and exact nearest-rank p90. One window sort per stratum;
    at 100 TB the production variant is the `approx_percentile`
    sketch (map-side, no sort), not declared because approximation
    isn't oracle-stable."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        "lang",
        F.expr("CAST(size(split(text, ' ')) AS BIGINT)").alias("n"),
    )
    w = Window.partitionBy("lang")
    r = t.select(
        "lang",
        "n",
        F.row_number().over(w.orderBy("n", "doc_id")).alias("rn"),
        F.count("*").over(w).alias("cnt"),
    )
    k_lo = F.floor((F.col("cnt") + 1) / 2)
    k_hi = F.floor((F.col("cnt") + 2) / 2)
    k_90 = F.floor((9 * F.col("cnt") + 9) / 10)
    return (
        r.groupBy("lang")
        .agg(
            F.max("cnt").alias("n_docs"),
            F.sum("n").alias("total_tokens"),
            F.min("n").alias("min_tokens"),
            F.max("n").alias("max_tokens"),
            (
                F.sum(F.when(F.col("rn") == k_lo, F.col("n")).otherwise(0))
                + F.sum(F.when(F.col("rn") == k_hi, F.col("n")).otherwise(0))
            ).alias("median_x2"),
            F.sum(F.when(F.col("rn") == k_90, F.col("n")).otherwise(0)).alias(
                "p90_tokens"
            ),
        )
        .orderBy("lang")
    )
