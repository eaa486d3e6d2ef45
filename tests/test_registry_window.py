"""Registry/driver-window invariant.

The round driver records correctness rows for the alphabetically first
50 registry names. This guard keeps the coverage property that r3
established — every query has a driver row in some round — from
silently regressing: any NEW query must either sort after the current
window cutoff (documented pytest-only coverage) or displace only
names that already hold a driver row from a committed CORRECTNESS
file. If this test fails, rename the new query (or update the
committed CORRECTNESS files) so no query ends up both outside the
window and without a historical row.
"""

import json
from pathlib import Path

from core_spark.plans.registry import REGISTRY

DRIVER_WINDOW = 50
_REPO = Path(__file__).resolve().parent.parent

# Queries that deliberately live outside the window with pytest-oracle
# coverage only — each must be called out in COVERAGE.md.
# r4: q_sketch_cms was renamed q_cms_heavy INTO the window (the one
# query that had zero driver rows); the set is empty again.
# r5: 11 new queries were deliberately named after the cutoff because
# the r4 cohort was still waiting for its first driver row.
# r7: the window is saturated with 20 first-time r7 names (none may
# be displaced), so the late-r7 additions are deliberately named
# after the cutoff for r8 rotation — the same protocol as r5.
# r6: CORRECTNESS_r05.json landed (50/50 green), so the r5 cohort plus
# q_stream_dedup (whose only driver row predated its oracle) rotated
# INTO the window via renames — q_kmeans→q_cluster_kmeans,
# q_ivf_kmeans→q_ann_ivf_kmeans, q_hard_negatives→q_ann_hard_negatives,
# q_recall_ann→q_ann_recall, q_tokenize_bpe→q_bpe_encode,
# q_seq_pack→q_doc_pack, q_temp_mix→q_domain_temp_mix,
# q_overlap_matrix→q_corpus_overlap, q_span_scrub→q_doc_span_scrub,
# q_scrub_decontam→q_decontam_scrub, q_train_order→q_curriculum_order,
# q_stream_dedup→q_dedup_stream. The 12 names they displaced all hold
# green r5 rows. The set is empty again.
# r8: CORRECTNESS_r07.json landed (50/50 green), so the six late-r7
# names rotated INTO the window via renames — q_vec_pq→q_ann_pq,
# q_pq_recall→q_ann_pq_recall, q_quality_nb→q_bayes_quality,
# q_webdataset→q_bundle_tar, q_warc_gz→q_cc_warc_gz,
# q_pdf_extract→q_cc_pdf. Every name they displaced holds a green
# r7-or-earlier row. Late-r8 additions were deliberately named after
# the cutoff for r9 rotation (the window held 15 first-time r8
# names that had to keep their slots) — the r5/r7 protocol.
# r9: CORRECTNESS_r08.json landed (50/50 green — every window name
# now holds a green row), so the seven late-r8 names rotated INTO the
# window via renames — q_license_scan→q_audit_license,
# q_ndjson_gate→q_bundle_ndjson, q_orc_meta→q_blocks_orc,
# q_parquet_meta→q_blocks_parquet, q_rank_ndcg→q_ann_ndcg,
# q_sent_split→q_canon_sent, q_wiki_dump→q_bundle_wiki. Every name they
# displaced holds a green r8 row. Late-r9 additions were deliberately
# named after the cutoff for r10 rotation (the window held 8
# first-time r9 names that had to keep their slots) — the r5/r7/r8
# protocol.
# r10: CORRECTNESS_r09.json landed (50/50 green — every window name
# holds a green row), so the thirteen late-r9 names rotated INTO the
# window via renames — q_canon_unicode→q_audit_nfc,
# q_fuzzy_pairs→q_block_fuzzy, q_jpeg_quality→q_bitmap_jpegq,
# q_mrl_recall→q_ann_mrl, q_orc_read→q_bits_orc,
# q_parquet_pages→q_bits_pages, q_parquet_read→q_bits_parquet,
# q_skew_audit→q_audit_skew, q_warc_revisit→q_blocks_warc,
# q_xz_streams→q_blocks_xz, q_zstd_decode→q_bits_zstd,
# q_zstd_frames→q_blocks_zstd, q_zstd_seek→q_blocks_zstd_seek.
# Every name they displaced (q_bm25 … q_canon_sent) holds a green
# r8/r9 row.
# Late-r10 additions are deliberately named after the cutoff for r11
# rotation (the window holds 13 first-time r10 names that must keep
# their slots) — the r5/r7/r8/r9 protocol, cohort kept small.
# r11: CORRECTNESS_r10.json landed (50/50 green — every window name
# holds a green row), so the eight late-r10 names rotated INTO the
# window via renames — q_embed_audit→q_audit_embed,
# q_journal_codec→q_append_codec, q_ocf_values→q_bits_avro,
# q_orc_lists→q_bits_orc_lists, q_parquet_lists→q_bits_parquet_lists,
# q_sample_strat→q_balance_strat, q_scan_audit→q_audit_scan,
# q_split_leakage→q_audit_leakage. The names they displaced
# (q_block_fuzzy … q_bloom_auto) all hold green r10 rows. Late-r11
# additions sort after the new cutoff (q_bits_zstd) for r12 rotation.
# r12: CORRECTNESS_r11.json landed (50/50 green — every window name
# holds a green row), so the two late-r11 names rotated INTO the
# window via renames — q_nested_values→q_bits_nested,
# q_ts_values→q_bits_epoch. The names they displaced (q_bits_zstd,
# q_block_fuzzy) hold green r11/r10 rows. The set is empty again.
# r13: the new q_bits_orc_stats sorts into the window at position
# 50, displacing q_bits_pages (green r12 row + SWEEP_r12 entry).
# Late-r13 additions (the container/markup tier) sort far beyond
# the cutoff (q_bundle_*, q_cc_*, q_crawl_*); per the standing
# rotation protocol they take pytest-only + full-registry SWEEP_r13
# coverage this round and rotate into the window in r14 (COVERAGE.md
# "Round-13 rotation").
# r14 (an OPTIMIZATION round): the rotation is DEFERRED — the
# optimization-round contract forbids removing or renaming any
# existing bench/registry query (a rename would surface as 14
# dropped queries), so the cohort keeps PYTEST_ONLY + full-sweep
# coverage (SWEEP_r13/SWEEP_r14) one more round and rotates in the
# next BUILD round instead, same mechanics as below
# (OPTIMIZATION_r14.md "Round-14 driver-window rotation").
# Original rotation plan, unchanged: once a CORRECTNESS file lands
# green rows for the current window, rename this cohort to sort
# inside the cutoff (the established q_bits_*/q_bitmap_* style,
# e.g. q_bits_zip, q_bits_docx, …) — the names they displace
# (q_bits_pages upward) will then hold r13 window rows AND green
# SWEEP entries, keeping the no-blind-spot invariant.
PYTEST_ONLY: set[str] = {"q_bundle_epub", "q_bundle_mbox", "q_bundle_zip", "q_cc_docx", "q_cc_eml", "q_cc_ipynb", "q_cc_latex", "q_cc_markdown", "q_cc_odt", "q_cc_rtf", "q_cc_sniff", "q_cc_xlsx",
    "q_crawl_feed", "q_crawl_meta"}


def _historical_rows() -> set[str]:
    names: set[str] = set()
    for f in sorted(_REPO.glob("CORRECTNESS_r*.json")):
        names |= set(json.loads(f.read_text()).keys())
    return names


def test_every_query_has_driver_coverage_path():
    names = sorted(REGISTRY)
    window = set(names[:DRIVER_WINDOW])
    covered = _historical_rows() | window | PYTEST_ONLY
    uncovered = [n for n in names if n not in covered]
    assert not uncovered, (
        f"queries outside the driver's first-{DRIVER_WINDOW} window with "
        f"no historical CORRECTNESS row: {uncovered} — rename them to "
        "sort inside the window or accept pytest-only coverage "
        "explicitly in COVERAGE.md"
    )
