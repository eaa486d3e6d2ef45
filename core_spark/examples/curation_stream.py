"""curation-stream: an LLM-data curation pipeline on the consumer
runtime — the engine-superset sibling of word-count/stream-sum/
bike-share (those mirror the reference's examples; this one shows the
same shard/journal machinery running the training-data tier).

Shape: raw document chunks stream through the shard runner; each
micro-batch is scored (language ID + stopword-marker quality,
`functions/text.py`), content-hash deduplicated WITHIN the batch and
AGAINST the already-materialized clean corpus (read-your-own-journal —
the q_incr_dedup pattern made streaming), and the accepted rows are
appended exactly-once to a `clean/docs` journal whose JournalSpec
lists `lang` as a bloom column — so per-language reads of the curated
corpus prune micro-batch fragments via the manifest index.

Serving is SQL over the materialization (the bike-share pattern):
`corpus_stats` summarizes kept docs per (lang, verdict-free) and
`clean_read` is the bloom-pruned per-language read path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from core_spark.catalog import CatalogStore, JournalSpec
from core_spark.functions.text import spark_lang_pred, spark_stopword_ratio
from core_spark.sources.journal import Journal
from core_spark.streaming.shard import ShardConfig, run_shard

CLEAN_JOURNAL = "clean/docs"
_MIN_TOKENS = 4  # quality floor: shorter docs are boilerplate/noise


def apply_clean_spec(out_root: str) -> None:
    """DDL for the curated-corpus journal: bloom-index `lang` so the
    per-language serving reads skip non-covering fragments."""
    CatalogStore(out_root).apply(
        upserts=(JournalSpec(name=CLEAN_JOURNAL, bloom_columns=("lang",)),)
    )


def curate_batch(out_root: str):
    """Per-batch transform: score, gate, dedup (in-batch + vs the
    materialized corpus). Returns the accepted rows only — rejects
    simply don't reach the journal, the scrub-at-ingest shape."""

    def transform(batch: DataFrame) -> DataFrame:
        spark = batch.sparkSession
        toks = "split(lower(text), ' +')"
        scored = batch.select(
            "doc_id",
            "text",
            F.expr(spark_lang_pred(toks)).alias("lang"),
            F.expr(f"size({toks})").alias("n_tokens"),
            F.expr(spark_stopword_ratio(toks)).alias("stop_ratio"),
            F.md5("text").alias("h"),
        )
        gated = scored.filter(F.col("n_tokens") >= _MIN_TOKENS)
        # in-batch dedup: lowest doc_id wins per content hash
        # (groupBy-min + join back — the skew-safe exact-dedup shape)
        firsts = gated.groupBy("h").agg(F.min("doc_id").alias("doc_id"))
        uniq = gated.join(firsts, ["h", "doc_id"])
        # vs the materialized corpus (read-your-own-journal): the
        # clean journal's content hashes are the incremental index.
        # At 100 TB the anti-join probes a dedicated hash-index
        # journal (32B/doc — the lshidx pattern of test_shard.py)
        # instead of re-scanning the corpus; column pruning already
        # keeps this read to the one h column.
        j = Journal(out_root, CLEAN_JOURNAL)
        try:
            seen = j.read(spark).select("h").distinct()
            uniq = uniq.join(seen, "h", "left_anti")
        except ValueError:
            pass  # first batch: no fragments yet
        return uniq.select(
            "doc_id", "text", "lang", "n_tokens", "stop_ratio", "h"
        )

    return transform


def run_curation(
    spark: SparkSession,
    source_glob: str,
    out_root: str,
    checkpoint_dir: str,
) -> None:
    apply_clean_spec(out_root)
    cfg = ShardConfig(
        source_glob=source_glob,
        source_schema="doc_id long, text string",
        out_root=out_root,
        out_journal=CLEAN_JOURNAL,
        shard_id="curation-0",
        checkpoint_dir=checkpoint_dir,
        max_files_per_trigger=1,
    )
    run_shard(spark, cfg, curate_batch(out_root)).awaitTermination(300)


def corpus_stats(spark: SparkSession, out_root: str) -> DataFrame:
    """Serving: per-language curated-corpus summary over the
    materialization (the bike-share SQL-over-state pattern)."""
    clean = Journal(out_root, CLEAN_JOURNAL).read(spark)
    return clean.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
    )


def clean_read(spark: SparkSession, out_root: str, lang: str) -> DataFrame:
    """Per-language read of the curated corpus — rides the manifest
    bloom index, so fragments from micro-batches that held no such
    language never reach the file listing."""
    return Journal(out_root, CLEAN_JOURNAL).read(
        spark, where=[("lang", "=", lang)]
    )
