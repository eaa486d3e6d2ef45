"""Benchmark harness: runs the headline declared queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...}

Each query is executed as the engine would serve it — full plan through
Catalyst/AQE, results drained with a count-style action (no driver-side
collect of payloads).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from core_spark.plans.registry import REGISTRY  # noqa: E402
from core_spark.session import get_spark  # noqa: E402

# Headline set: the scale-relevant declared queries (scan/agg, joins,
# windows, set ops, the sequencer dedup, the mappings, and the
# LLM-pipeline dedup/similarity tier).
HEADLINE = [
    "q_wc1",
    "q_ss1",
    "q_bs_win",
    "q_dedup",
    "q_join1",
    "q_join2",
    "q_topk",
    "q_setop",
    "q_tpch1",
    "q_tpch3",
    "q_tpch6",
    "q_shuf",
    "q_session",
    "q_asof",
    "q_dedup_exact",
    "q_simhash",
    "q_minhash_lsh",
    "q_ngram_jaccard",
    "q_knn_cosine",
    "q_ann_lsh",
    "q_ann_ivf",
    "q_h08",
    "q_h14",
    "q_grouping_sets",
    "q_h09",
    "q_h13",
    "q_h17",
    "q_h21",
    "q_decontam",
    "q_repetition",
    "q_dup_clusters",
    "q_embed_dup",
    "q_curate",
    "q_pii_redact",
    "q_chunk",
    "q_ngram_topk",
    "q_doc_token_stats",
    "q_kmv_distinct",
    "q_budget_pack",
    "q_incr_dedup",
    "q_embed_quant",
    "q_funnel",
    "q_retention",
    "q_label_centroid",
    "q_cluster_zorder",
    "q_graph_pagerank",
    "q_doc_tfidf",
    "q_bm25",
    "q_hopping",
    "q_anomaly",
    "q_bucketed_range_join",
    "q_coloc_join",
    "q_dup_ingest",
    "q_dup_spans",
    "q_exact_quota",
    "q_domain_mix",
    "q_dsir",
    "q_bpe_pairs",
    "q_embed_semdedup",
    "q_doc_lm",
    "q_graph_triangles",
    "q_approx_quantile",
    "q_domain_sample",
    "q_embed_ingest",
    "q_curate2",
    "q_bpe_train",
    "q_fusion_rank",
    "q_cluster_kmeans",
    "q_doc_pack",
    "q_domain_temp_mix",
    "q_corpus_overlap",
    "q_doc_span_scrub",
    "q_bpe_encode",
    "q_ann_hard_negatives",
    "q_ann_ivf_kmeans",
    "q_curriculum_order",
    "q_decontam_scrub",
    "q_ann_recall",
    "q_chunk_cdc",
    "q_bloom_ingest",
    "q_corpus_sample",
    "q_auto_embed_dedup",
    "q_cell_semdedup",
    "q_ann_negatives",
    "q_count_kmv",
    "q_bloom_auto",
    "q_av_meta",
    "q_av_keyframes",
    "q_av_fmp4",
    "q_audio_segments",
    "q_clean_html",
    "q_av_captions",
    "q_crawl_extract",
    "q_canon_urls",
    "q_chunk_para",
    "q_crawl_dates",
    "q_crawl_robots",
    "q_code_detect",
    "q_audio_flac",
    "q_anchor_links",
    "q_cc_pdf",
    "q_bayes_quality",
    "q_ann_pq",
    "q_ann_pq_recall",
    "q_cc_warc_gz",
    "q_bundle_tar",
    "q_canon_text",
    "q_cc_sitemap",
    "q_audio_vad",
    "q_bitmap_phash",
    "q_cc_cdx",
    "q_avro_blocks",
    "q_bitmap_exif",
    "q_bitmap_audit",
    "q_bundle_wiki",
    "q_audit_license",
    "q_bundle_ndjson",
    "q_blocks_parquet",
    "q_ann_ndcg",
    "q_canon_sent",
    "q_ann_bq",
    "q_blocks_orc",
    "q_blocks_zstd",
    "q_blocks_zstd_seek",
    "q_bits_zstd",
    "q_bits_parquet",
    "q_bits_orc",
    "q_audit_skew",
    "q_block_fuzzy",
    "q_audit_nfc",
    "q_blocks_xz",
    "q_blocks_warc",
    "q_ann_mrl",
    "q_bitmap_jpegq",
    "q_bits_pages",
    "q_append_codec",
    "q_bits_avro",
    "q_bits_orc_lists",
    "q_bits_parquet_lists",
    "q_audit_scan",
    "q_ann_filtered",
    "q_audit_embed",
    "q_balance_strat",
    "q_audit_leakage",
    "q_bits_nested",
    "q_bits_dict",
    "q_bits_epoch",
    "q_bits_orc_stats",
    "q_bundle_zip",
    "q_bundle_epub",
    "q_bundle_mbox",
    "q_cc_docx",
    "q_cc_xlsx",
    "q_cc_odt",
    "q_cc_rtf",
    "q_cc_eml",
    "q_cc_sniff",
    "q_cc_markdown",
    "q_cc_latex",
    "q_cc_ipynb",
    "q_crawl_meta",
    "q_crawl_feed",
    # q_dup_canonical is intentionally absent: its dominant cost is
    # the same pair+CC pipeline q_dup_clusters already times;
    # q_bands_serve (streaming materialize->serve) follows the
    # q_cms_serve/q_bike_cycles convention of not being benched here
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="core_spark-bench")

    timings: dict[str, float] = {}
    for name in HEADLINE:
        q = REGISTRY.get(name)
        if q is None:
            continue
        df = q.fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()  # warm (plan+IO caches)
        # Queries that persist() intermediates (curate, CC, pagerank)
        # leave cached blocks behind; without this, later queries in the
        # 50-query session inherit memory pressure and drift 1.3-2.8x
        # (measured r1 vs r2). Clearing between timings keeps each
        # number a fresh-session-comparable measurement. The explicit
        # JVM GC extends the same policy to localCheckpoint blocks,
        # whose release waits on driver-side garbage collection of the
        # checkpointed RDD handles — without it, iterative queries
        # measured mid-session drift 1.5-2x against their isolated
        # cost (measured r4: q_curate 5.0->8.0s across back-to-back
        # trials without GC, flat ~3.7s with).
        # Min of two timed runs: this host is multi-tenant and a
        # single timed run occasionally absorbs a neighbor's CPU burst
        # (measured r4: q_dup_spans 9.4s vs 2.0s for identical code in
        # back-to-back bench invocations). The min of two fresh-cache
        # runs is the standard noise-robust estimator for a
        # deterministic workload; each run still clears cache + GCs
        # first, so neither inherits the other's state.
        runs = []
        for _ in range(2):
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            df = q.fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        timings[name] = round(min(runs), 4)
        spark.catalog.clearCache()

    total = round(sum(timings.values()), 4)
    payload = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf),
    }
    print(json.dumps(payload))
    # The driver records only a truncated tail of stdout; when
    # SPARK_GRAFT_BENCH_OUT names a file, the FULL per-query dict is
    # also written there (the committed BENCH_FULL_r{N}.json artifact
    # that makes round-over-round mover audits mechanical).
    out_path = os.environ.get("SPARK_GRAFT_BENCH_OUT")
    if out_path:
        with open(out_path, "w") as fh:
            json.dump(payload, fh, indent=1)
            fh.write("\n")


if __name__ == "__main__":
    main()
