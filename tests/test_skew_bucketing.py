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
