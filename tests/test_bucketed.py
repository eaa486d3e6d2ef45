"""Bucketed co-located join: the aligned-partition contract is
executable — join AND bucket-key aggregate run with zero Exchange."""

import pytest
from pyspark.sql import functions as F

from core_spark.plans.registry import REGISTRY
from core_spark.sources.bucketed import co_located_join, write_bucketed

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def tables(spark, tmp_path_factory):
    from core_spark.io import load_table

    root = tmp_path_factory.mktemp("bucketed")
    li = load_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    orders = load_table(spark, SF, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    write_bucketed(li, "t_bkt_li", "l_orderkey", 4, str(root / "li"))
    write_bucketed(orders, "t_bkt_ord", "o_orderkey", 4, str(root / "ord"))
    return "t_bkt_li", "t_bkt_ord"


def test_coloc_join_has_no_exchange(spark, tables):
    lt, rt = tables
    j = co_located_join(spark, lt, rt, "l_orderkey", "o_orderkey")
    agg = j.groupBy("l_orderkey").agg(F.count("*").alias("n"))
    agg.collect()
    plan = agg._jdf.queryExecution().executedPlan().toString()
    # AQE's toString appends the pre-adaptive plan; assert on the
    # final plan only
    plan = plan.split("== Initial Plan ==")[0]
    assert "SortMergeJoin" in plan
    # the contract: no shuffle anywhere — not for the join, not for
    # the bucket-key aggregate (remaining Sort nodes are
    # partition-local, exchange-free)
    assert "Exchange" not in plan, plan
    assert plan.count("Bucketed: true") == 2, plan


def test_coloc_join_matches_plain_join(spark, tables):
    lt, rt = tables
    from core_spark.io import load_table

    got = (
        co_located_join(spark, lt, rt, "l_orderkey", "o_orderkey")
        .groupBy("l_orderkey")
        .agg(F.count("*").alias("n"))
        .orderBy("l_orderkey")
        .collect()
    )
    li = load_table(spark, SF, "lineitem")
    orders = load_table(spark, SF, "orders")
    want = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("l_orderkey")
        .agg(F.count("*").alias("n"))
        .orderBy("l_orderkey")
        .collect()
    )
    assert got == want


def test_one_file_per_bucket(spark, tables, tmp_path_factory):
    # the repartition-before-bucketBy contract: bucket i is ONE file,
    # so the persisted sort survives and small files don't fan out
    import os

    lt, _ = tables
    files = [
        f
        for f in spark.table(lt).inputFiles()
        if f.endswith(".parquet") or ".parquet" in f
    ]
    assert len(files) == 4, files


def test_q_coloc_join_runs(spark):
    q = REGISTRY.get("q_coloc_join")
    rows = q.fn(spark, SF).limit(5).collect()
    assert rows and rows[0]["n_items"] >= 1
