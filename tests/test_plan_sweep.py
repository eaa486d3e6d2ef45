"""Blanket scale-killer sweep: no registry query may plan a cartesian
or nested-loop join unless its name is allowlisted here with a reason.

The targeted plan-shape tests (test_plans.py) pin specific contracts;
this sweep is the backstop that catches a NEW query (or a regression
in an old one) accidentally introducing the O(n²) join shapes —
Catalyst falls back to BroadcastNestedLoopJoin silently whenever a
join loses its equi-key, and nothing else in CI would notice until a
bench regression at scale.
"""

import pytest

from core_spark.plans.registry import REGISTRY
from tests.conftest import SF_SMOKE

# Queries whose nested-loop/cross shapes are deliberate. Every entry
# must state why the shape is scale-safe (or explicitly not the scale
# path).
ALLOWED = {
    "q_bm25": "corpus stats (S, N) are a broadcast ONE-ROW global",
    "q_doc_tfidf": "doc-count scalar is a broadcast ONE-ROW global",
    "q_h11": "TPC-H Q11 global threshold: broadcast one-row aggregate",
    "q_h22": "TPC-H Q22 global avg balance: broadcast one-row aggregate",
    "q_knn_cosine": "brute-force baseline, labeled NOT the scale path "
                    "(verification tier for the ANN operators)",
    "q_ann_recall": "recall audit: brute side runs over the 10-query "
                    "SAMPLE x corpus (the verification tier), the LSH "
                    "side is bucket-keyed",
    "q_ann_ndcg": "nDCG audit: same brute 10-query SAMPLE x corpus "
                   "verification tier as q_ann_recall; the LSH side "
                   "is bucket-keyed and the DCG join is equi-keyed",
    "q_ann_mrl": "truncation audit: full-width and per-width "
                    "truncated sides are all the brute 10-query "
                    "SAMPLE x corpus verification tier; the width "
                    "grid is a TWO-ROW broadcast",
    "q_ann_bq": "binary-quantization scan: the BROADCAST side is the "
                "constant 10-row query sample, streamed against the "
                "8-byte code table (codes never broadcast — ~80 GB at "
                "10^10 vectors), with map-side partial top-k; exact "
                "rerank broadcasts the 200-row shortlist against the "
                "streamed corpus, never corpus x corpus",
    "q_ann_ivf": "centroid argmax: each vector x broadcast n_cells "
                 "centroid rows IS the assignment work, map-side",
    "q_embed_semdedup": "same centroid argmax as q_ann_ivf (shared "
                        "ivf_assign): vector x broadcast n_cells rows, "
                        "map-side",
    "q_ann_hard_negatives": "same centroid argmax as q_ann_ivf (shared "
                        "ivf_assign); the candidate join itself is "
                        "cell-keyed",
    "q_doc_lm": "vocab size V is a broadcast ONE-ROW global",
    "q_bayes_quality": "class totals (tot1, tot0, V) and priors (n1, n0) "
                    "are two broadcast ONE-ROW globals over the "
                    "token-count table",
    "q_ann_pq": "ADC tables: 5 query subvectors x broadcast "
                "4-codeword codebooks (constant rows) — the lookup "
                "tables that REPLACE full-width distance math",
    "q_ann_pq_recall": "inherits q_ann_pq's ADC-table broadcasts; the "
                   "exact side is the 5-query SAMPLE x corpus "
                   "verification tier (q_ann_recall's convention), "
                   "NOT the scale path",
    "q_curate2": "inherits q_embed_semdedup's centroid argmax "
                 "(vector x broadcast n_cells rows, map-side)",
    "q_bpe_train": "each round's winning merge rides a ONE-ROW "
                   "broadcast into the next round's lambda",
    "q_bpe_encode": "same ONE-ROW winner broadcast as q_bpe_train "
                    "(shared _bpe_rounds loop)",
    "q_fusion_rank": "inherits q_bm25's (S, N) one-row global; the "
                     "query embedding is a ONE-ROW broadcast over the "
                     "corpus scan",
    "q_cluster_kmeans": "Lloyd assignment: each vector x broadcast k centroid "
                "rows IS the argmin work, map-side (k is a constant); "
                "same shape as q_ann_ivf's ivf_assign",
    "q_ann_ivf_kmeans": "inherits q_cluster_kmeans' broadcast-k argmin for index "
                    "build and query probes; the search join itself "
                    "is cell-keyed",
    "q_domain_temp_mix": "the weight denominator is a broadcast ONE-ROW "
                  "global over the rows-per-source weight table",
    "q_corpus_overlap": "source<source pair join runs on ONE k-array "
                        "sketch row per source — S² sketch pairs, "
                        "corpus-size-independent",
    "q_curriculum_order": "the epoch fan-out is a TWO-ROW broadcast "
                     "(constant epoch count) over the doc-id scan",
}

# Building these executes real streaming jobs / journal writes /
# store materializations — their plan shapes are pinned individually
# where it matters, and the DataFrame they return is a local
# serve-side relation whose plan the sweep would learn nothing from.
EXECUTING = {n for n in REGISTRY if "stream" in n or "serve" in n} | {
    "q_journal_roundtrip",
    "q_framed_journal",
    "q_frag",
    "q_bike_cycles",  # SQL-store materialize -> serve runs at build
    "q_bfs_frontier",  # frontier shard run + journal serve at build
}

SWEEP = sorted(n for n in REGISTRY if n not in EXECUTING)


@pytest.mark.parametrize("name", SWEEP)
def test_no_accidental_cartesian_or_nested_loop(spark, name):
    df = REGISTRY[name].fn(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "extended"
        )
    )
    hits = [
        k
        for k in ("CartesianProduct", "BroadcastNestedLoopJoin", "Join Cross")
        if k in plan
    ]
    if name in ALLOWED:
        return  # deliberate; reason documented above
    assert not hits, (
        f"{name} plans {hits} — an O(n^2) join shape. Either restore "
        "the equi-key (bucketize: see operators/rangejoin.py) or "
        "allowlist it here with a scale-safety justification."
    )


def test_allowlist_entries_still_needed(spark):
    """Prune the allowlist when a query stops needing it — stale
    exemptions hide future regressions."""
    for name in sorted(ALLOWED):
        df = REGISTRY[name].fn(spark, SF_SMOKE)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "extended"
            )
        )
        assert any(
            k in plan
            for k in ("CartesianProduct", "BroadcastNestedLoopJoin", "Join Cross")
        ), f"{name} no longer plans a nested loop — remove it from ALLOWED"


def test_storage_backed_serves_page_never_bulk_collect():
    """Serve-tier invariant (uniform as of r11): every storage-backed
    serve drains through serve_pages / SQLStore.query_pages — the
    ONLY .collect() in the serve module is the one inside
    serve_pages' own LIMIT-page request, so no serve request
    materializes more than one page."""
    import pathlib

    import core_spark.plans.queryable_state as qs

    src = pathlib.Path(qs.__file__).read_text().splitlines()
    hits = [
        (i + 1, ln.strip())
        for i, ln in enumerate(src)
        if ".collect()" in ln
    ]
    assert len(hits) == 1 and "page.limit(page_size)" in hits[0][1], (
        "storage-backed serve collects outside serve_pages: "
        f"{hits}"
    )

    import ast

    import core_spark.streaming.store_sql as ss

    tree = ast.parse(pathlib.Path(ss.__file__).read_text())
    sql_literals = [
        n.value
        for n in ast.walk(tree)
        if isinstance(n, ast.Constant)
        and isinstance(n.value, str)
        and "SELECT" in n.value.upper()
    ]
    assert sql_literals, "expected SQL statements in the store"
    bad = [s for s in sql_literals if "OFFSET" in s.upper()]
    assert not bad, (
        f"the SQL store must keyset-paginate, never OFFSET: {bad}"
    )
