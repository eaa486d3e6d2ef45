"""Physical-plan shape assertions — the scale contract, kept as tests
so a regression that silently de-optimizes a plan (lost pushdown,
broadcast→SMJ flip, extra shuffle) fails CI rather than only showing
up at 100 TB."""

import re

import pytest

from core_spark.plans.registry import REGISTRY
from tests.conftest import SF_SMOKE


def _plan(spark, name: str) -> str:
    df = REGISTRY[name].fn(spark, SF_SMOKE)
    # formatted mode keeps scan metadata (PushedFilters et al.) untruncated
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_tpch6_filters_pushed_and_pruned(spark):
    plan = _plan(spark, "q_tpch6")
    assert "GreaterThanOrEqual(l_shipda" in plan  # pushed to the scan
    assert "LessThan(l_quantity" in plan
    # column pruning: the scan must not read the unused columns
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m and "l_orderkey" not in m.group(1) and "l_returnflag" not in m.group(1)


def test_join2_broadcasts_small_side(spark):
    plan = _plan(spark, "q_join2")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_topk_uses_partial_topk(spark):
    # per-partition top-K merge, never a global sort of the aggregate
    assert "TakeOrderedAndProject" in _plan(spark, "q_topk")


def test_wc2_prefix_pushed(spark):
    assert "StringStartsWith(p_type,PROMO)" in _plan(spark, "q_wc2")


def test_dedup_single_hash_shuffle(spark):
    """All three sequencer windows must share ONE hash exchange on
    producer (subset-clustering satisfaction); a second hash shuffle
    means someone broke the co-partitioning."""
    plan = _plan(spark, "q_dedup")
    hash_exchanges = re.findall(r"Arguments: hashpartitioning\((\w+)", plan)
    assert len(hash_exchanges) == 1, hash_exchanges
    assert hash_exchanges[0].startswith("producer")


@pytest.mark.parametrize("name", ["q_wc1", "q_tpch1", "q_ss1"])
def test_aggregates_are_partial_final(spark, name):
    # partial (map-side) aggregation before the shuffle — the
    # in-txn-cache → store-flush shape of the reference
    plan = _plan(spark, name)
    assert plan.count("HashAggregate") >= 2


def test_tpch8_broadcasts_dims_no_cartesian(spark):
    plan = _plan(spark, "q_h08")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    # the type filter reaches the part scan
    assert "EqualTo(p_type,ECONOMY)" in plan


def test_tpch14_broadcast_and_pushed_dates(spark):
    plan = _plan(spark, "q_h14")
    assert "BroadcastHashJoin" in plan
    assert "GreaterThanOrEqual(l_shipdate" in plan


def test_tpch2_size_filter_pushed(spark):
    assert "EqualTo(p_size,15)" in _plan(spark, "q_h02")


def test_grouping_sets_single_expand_single_agg_shuffle(spark):
    """All three grouping sets compute in ONE Expand + one aggregate
    exchange — not one scan/shuffle per set."""
    plan = _plan(spark, "q_grouping_sets")
    assert plan.count("Expand") >= 1
    hash_exchanges = re.findall(r"Arguments: hashpartitioning\(", plan)
    assert len(hash_exchanges) == 1, plan[:40]


def test_ivf_assignment_broadcasts_centroids(spark):
    plan = _plan(spark, "q_ann_ivf")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_jaccard_selfjoin_shares_blk_s_partitioning(spark):
    """The df-cap window and the pair self-join must run on ONE
    (blk, s) hash exchange: the capped index is materialized
    (persist) and its partitioning is reused by both self-join sides
    — no re-shuffle of the exploded shingle stream."""
    # the assertion is about the COLD plan; a cache left warm by an
    # earlier test prints the cached subtree's exchange once per scan
    spark.catalog.clearCache()
    plan = _plan(spark, "q_ngram_jaccard")
    exchanges = re.findall(r"Arguments: hashpartitioning\(([^)]*)\)", plan)
    blk_s = [e for e in exchanges if e.startswith("blk")]
    assert len(blk_s) == 1, exchanges
    assert "InMemoryTableScan" in plan


def test_decontam_broadcasts_benchmark_and_keeps_split_linear(spark):
    """The benchmark shingle set must broadcast (eval suites are
    small; the corpus side must never shuffle its shingles to meet
    it), and the corpus tokenizer must not be re-inlined into a
    generator filter: the explode's input must be the materialized
    token-array column, not a nested split() call (the quadratic
    re-evaluation trap — see operators/dedup.py:_explode_shingles)."""
    plan = _plan(spark, "q_decontam")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # generator filters of the form size(transform(... split(...) ...))
    # mean pushdown substituted the alias chain back into the filter
    gen_filters = re.findall(r"Filter.*size\(transform\(split\(", plan)
    assert not gen_filters, gen_filters


def test_split_is_pure_projection(spark):
    """q_datasplit must not shuffle except the presentation orderBy —
    membership is a map-side recomputable projection."""
    plan = _plan(spark, "q_datasplit")
    assert "hashpartitioning" not in plan
    assert "BroadcastHashJoin" not in plan and "SortMergeJoin" not in plan


def test_embed_dup_is_bucket_keyed_kernel_no_pair_join(spark):
    """q_embed_dup's pairing must happen inside the per-bucket Arrow
    kernel: exactly one grouped-map python node, clustered on the
    (band, bkt) exchange, and NO join operator — a join formulation
    would materialize the candidate set through interpreted
    higher-order-function folds (measured ~200us/pair)."""
    plan = _plan(spark, "q_embed_dup")
    assert "FlatMapGroupsInPandas" in plan
    # one kernel node: formatted explain shows the tree + one
    # numbered detail block per physical node
    assert len(re.findall(r"\(\d+\) FlatMapGroupsInPandas", plan)) == 1
    assert "hashpartitioning(band" in plan
    for join in ("SortMergeJoin", "BroadcastHashJoin", "CartesianProduct",
                 "BroadcastNestedLoopJoin"):
        assert join not in plan, join


def test_scrub_tier_plans(spark):
    """The scrub tier's scale contracts: redaction and sampling stay
    map-side (no shuffle but the presentation sort); chunking and the
    n-gram top-k materialize the token array exactly once (no
    re-inlined split() per generated row — the quadratic trap); the
    top-k compiles to TakeOrderedAndProject, not a global sort."""
    plan = _plan(spark, "q_pii_redact")
    assert "hashpartitioning" not in plan
    assert "Join" not in plan

    plan = _plan(spark, "q_sample")
    assert "hashpartitioning" not in plan
    assert "Join" not in plan

    for name in ("q_chunk", "q_ngram_topk"):
        plan = _plan(spark, name)
        assert plan.count("split(") == 1, name

    plan = _plan(spark, "q_ngram_topk")
    assert "TakeOrderedAndProject" in plan


def test_token_budget_no_global_data_window(spark):
    """q_budget_pack's per-document cumsum must be partitioned by
    bucket — a single-partition window over the data is the
    scale-killer this query exists to avoid. The only SinglePartition
    exchange allowed is the 64-row bucket-offset scan, and the
    offsets must broadcast back."""
    plan = _plan(spark, "q_budget_pack")
    assert re.search(r"windowspecdefinition\(bkt", plan)
    assert "BroadcastHashJoin" in plan
    # the doc-side window must not sit on a SinglePartition exchange:
    # every SinglePartition in the plan belongs to the offsets branch
    # (which aggregates to <= 64 rows before its window)
    assert plan.count("SinglePartition") == 1


def test_embed_quant_is_map_side(spark):
    plan = _plan(spark, "q_embed_quant")
    assert "hashpartitioning" not in plan
    assert "Join" not in plan


def test_incr_dedup_hash_keyed_no_cartesian(spark):
    plan = _plan(spark, "q_incr_dedup")
    for bad in ("CartesianProduct", "BroadcastNestedLoopJoin"):
        assert bad not in plan
    assert re.search(r"windowspecdefinition\(h#", plan)


def test_funnel_single_shuffle_no_joins(spark):
    """q_funnel must be the one-shuffle fold formulation — the
    min-chaining alternative carries three self-joins of the events
    table."""
    plan = _plan(spark, "q_funnel")
    assert "Join" not in plan
    assert len(re.findall(r"hashpartitioning\(user_id", plan)) == 1


def test_zorder_is_map_side(spark):
    plan = _plan(spark, "q_cluster_zorder")
    assert "hashpartitioning" not in plan
    assert "Join" not in plan


def test_pagerank_reuses_persisted_graph(spark):
    """Each PageRank round must join the PERSISTED edge/degree
    tables (InMemoryTableScan), not rebuild the lineitem×orders
    join five times; no cartesian anywhere."""
    plan = _plan(spark, "q_graph_pagerank")
    assert "InMemoryTableScan" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_pagerank_rank_join_is_shuffled_not_broadcast(spark):
    """The per-round rank join must be a ShuffledHashJoin — the rank
    vector is one row per NODE, which at 10⁹-node scale exceeds any
    broadcast limit; broadcasting it was VERDICT r3's scale flag.
    (The graph-BUILD subtree may broadcast orders at tiny SF — that
    is Catalyst's size-based call, flipping to SMJ at scale — so the
    assertion targets the join keyed on `node`, not the whole plan.)
    The cached graph side must also not re-shuffle: its persisted
    hashpartitioning(u) satisfies the join's distribution, so the
    InMemoryTableScan feeds the round join with no Exchange above it."""
    plan = _plan(spark, "q_graph_pagerank")
    # per-node detail blocks of the formatted explain
    blocks = re.split(r"\n\(\d+\) ", plan)
    rank_joins = [b for b in blocks if "keys [1]: [node#" in b]
    assert rank_joins, "no join keyed on the rank vector found"
    assert all(b.startswith("ShuffledHashJoin") for b in rank_joins), (
        "rank join must be ShuffledHashJoin, not broadcast"
    )
    # cache side streams straight into the round join: the tree shows
    # ShuffledHashJoin whose left subtree reaches InMemoryTableScan
    # without an intervening Exchange
    tree = plan.split("(1) ")[0]
    seg = re.search(
        r"ShuffledHashJoin[^\n]*\n(.*?)InMemoryTableScan", tree, re.S
    )
    assert seg and "Exchange" not in seg.group(1), (
        "persisted graph re-shuffled before the round join"
    )


def test_range_join_is_bucketized_not_nested_loop(spark):
    """The range join must plan as a bucket-keyed equi-join — a
    non-equi time predicate alone would force BroadcastNestedLoopJoin
    (O(n^2) compared rows, the 100 TB trap the bucketization exists
    to avoid)."""
    plan = _plan(spark, "q_bucketed_range_join")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "_bkt" in plan  # the bucket equi-key carries the join


def test_approx_quantile_estimates_near_exact(spark):
    """The bottom-k sample is deterministic (oracle-checked); this
    checks it is also a *good* sample: the exact CDF position of each
    estimate sits within ~4 standard errors (sqrt(p(1-p)/k), k=128)
    of its target quantile."""
    from core_spark.io import load_table
    from core_spark.plans.registry import REGISTRY
    from tests.conftest import SF_SMOKE

    est = {
        r["event_type"]: r
        for r in REGISTRY["q_approx_quantile"].fn(spark, SF_SMOKE).collect()
    }
    vals = (
        load_table(spark, SF_SMOKE, "events")
        .select("event_type", "value")
        .toPandas()
        .groupby("event_type")["value"]
    )
    for etype, series in vals:
        r = est[etype]
        s = series.sort_values().to_numpy()
        if r["n_sample"] >= len(s):  # group smaller than k: exact
            continue
        pos50 = (s <= r["p50_est"]).mean()
        pos90 = (s <= r["p90_est"]).mean()
        assert 0.30 <= pos50 <= 0.70, (etype, pos50)
        assert 0.75 <= pos90 <= 1.00, (etype, pos90)
