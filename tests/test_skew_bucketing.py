"""Scale-demo operators: salted join equivalence + bucketed co-located
join eliminating the shuffle (the DESIGN.md §2 claims, executed)."""

import pytest
from pyspark.sql import functions as F

from core_spark.operators.skew import salted_join


def test_salted_join_equals_plain_join(spark):
    # 90% of fact rows share one hot key
    fact = spark.range(0, 20_000).select(
        F.when(F.col("id") % 10 < 9, 7).otherwise(F.col("id") % 50).alias("k"),
        F.col("id").alias("v"),
    )
    dim = spark.range(0, 50).select(
        F.col("id").cast("int").alias("k"),
        F.concat(F.lit("dim"), F.col("id")).alias("name"),
    )
    plain = fact.join(dim, "k").groupBy("k", "name").agg(
        F.count("*").alias("c"), F.sum("v").alias("s")
    )
    salted = salted_join(fact, dim, "k", n_salts=8).groupBy("k", "name").agg(
        F.count("*").alias("c"), F.sum("v").alias("s")
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_aqe_splits_skewed_join_partition(spark):
    """The DESIGN.md skew playbook's first line of defense, executed:
    AQE detects the hot key's oversized partition at runtime and
    splits it (SortMergeJoin(skew=true)) — no salting needed for the
    common case. Thresholds are lowered so the local fixture
    triggers the same code path a 100 TB hot key would."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "32KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
    }
    prev = {k: spark.conf.get(k) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        # one key owns ~95% of fact rows, padded so its partition
        # clears the (lowered) byte threshold
        fact = spark.range(0, 60_000).select(
            F.when(F.col("id") % 20 < 19, 7)
            .otherwise(F.col("id") % 40)
            .alias("k"),
            F.concat(F.lit("x" * 64), F.col("id")).alias("pad"),
        )
        dim = spark.range(0, 40).select(
            F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("nm")
        )
        joined = fact.join(dim, "k")
        # run THIS DataFrame's execution (count() would plan its own
        # query and leave this one's adaptive plan unfinalized)
        assert len(joined.collect()) == 60_000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    orders = spark.range(0, 5000).select(
        (F.col("id") % 500).alias("custkey"), F.col("id").alias("okey")
    )
    customer = spark.range(0, 500).select(
        F.col("id").alias("custkey"), F.concat(F.lit("c"), F.col("id")).alias("name")
    )
    (orders.write.mode("overwrite").bucketBy(8, "custkey")
     .sortBy("custkey").saveAsTable("b_orders"))
    (customer.write.mode("overwrite").bucketBy(8, "custkey")
     .sortBy("custkey").saveAsTable("b_customer"))
    yield
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    """Bucketing = the reference's pre-aligned journal partitioning
    (consumer/protocol/protocol.proto:64-78): both sides pre-hashed on
    the key, so the join plans with zero Exchange."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("b_orders").join(spark.table("b_customer"), "custkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert joined.count() == 5000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_runtime_bloom_filter_prunes_fact_side(spark):
    """A selective filter on the dim side injects a runtime bloom
    filter into the fact-side scan (creation-side `bloom_filter_agg`,
    apply-side `might_contain`) — Spark's runtime-filter analog of the
    reference's offset/mod-time-pruned reads, and the scale path that
    keeps a 100 TB fact scan from shipping rows a filtered dim can
    never match. The scan-size threshold is lowered here because the
    local fact is tiny; at real scan sizes the default (10 GiB)
    passes on its own."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        from pyspark.sql import functions as F

        li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
        o = spark.read.parquet("/root/testdata/sf0.01/orders.parquet").filter(
            F.col("o_totalprice") > 400000
        )
        j = li.join(o, li.l_orderkey == o.o_orderkey)
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "bloom_filter_agg" in plan, plan[:2000]
        assert "might_contain" in plan, plan[:2000]
        # the bloom-pruned join returns exactly the unpruned result
        n_bloomed = j.count()
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
        try:
            plain = li.join(o, li.l_orderkey == o.o_orderkey)
            assert "might_contain" not in (
                plain._jdf.queryExecution().executedPlan().toString()
            )
            assert n_bloomed == plain.count()
        finally:
            spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)
