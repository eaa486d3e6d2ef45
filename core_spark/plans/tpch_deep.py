"""TPC-H deep set: Q4, Q9, Q11, Q13, Q15-Q22 adapted to the dataset.

The reference's relational surface is whatever its embedded SQLite /
remote Postgres executes (reference docs/examples-bike-share.rst:
452-480); the TPC-H suite stands in for that general capability. The
testdata is a reduced TPC-H (no partsupp; no commit/receipt dates,
phone, container, mfgr, comment columns), so each query keeps the
ORIGINAL's plan shape — correlated EXISTS -> semi join, NOT EXISTS ->
anti join, correlated scalar aggregate -> grouped aggregate joined
back, global scalar threshold -> broadcast cross join — with
predicates adapted to the columns that exist. lineitem stands in for
partsupp as the per-(part, supplier) relation where needed.

Money/threshold discipline (see q_tpch1): per-row integer cents, sums
over BIGINT (order-independent under any partitioning), ratio
thresholds by integer cross-multiplication — never a float compare on
an engine-dependent aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from core_spark.io import load_table
from core_spark.plans.registry import query

_CENTS_REV = "CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)"


def _rev_cents() -> F.Column:
    return F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("bigint")


# --------------------------------------------------------------- Q-TPCH4
@query(
    "q_h04",
    oracle="""
    SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
)
def q_h04(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 order-priority checking. The correlated EXISTS (a
    lineitem shipped >30 days after the order date — the dataset's
    'late' analog of commitdate < receiptdate) is a left-semi join
    whose condition references both sides; Spark plans it as one
    shuffle-semi-join, no subquery re-scan per row."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            li,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------- Q-TPCH9
@query(
    "q_h09",
    oracle=f"""
    SELECT n.n_name AS nation, EXTRACT(year FROM o.o_orderdate) AS o_year,
           SUM({_CENTS_REV}) / 100.0 AS sum_profit
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
)
def q_h09(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 product-type profit by supplier nation and year
    (profit = discounted revenue; the dataset has no ps_supplycost to
    subtract). part/supplier/nation are broadcast — lineitem, the only
    big side, is never shuffled before the final two-key aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg((F.sum(_rev_cents()) / 100.0).alias("sum_profit"))
        .orderBy(F.asc("nation"), F.desc("o_year"))
    )


# -------------------------------------------------------------- Q-TPCH11
@query(
    "q_h11",
    oracle=f"""
    WITH pv AS (
      SELECT l.l_partkey AS ps_partkey, SUM({_CENTS_REV}) AS value_c
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
      GROUP BY ps_partkey)
    SELECT ps_partkey, value_c / 100.0 AS value
    FROM pv
    WHERE value_c * 1000 > (SELECT SUM(value_c) FROM pv)
    ORDER BY value DESC, ps_partkey
    """,
)
def q_h11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 important stock: per-part value (via lineitem — the
    dataset's partsupp stand-in) for suppliers of a nation group,
    keeping parts worth > 0.1% of the group total. The global-total
    scalar subquery is a single-row aggregate broadcast-cross-joined
    against the per-part rows (one extra stage, no driver collect);
    the 0.1% threshold compares integer cents cross-multiplied, so
    both engines decide each part identically."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3")
    )
    pv = (
        li.join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy(F.col("l_partkey").alias("ps_partkey"))
        .agg(F.sum(_rev_cents()).alias("value_c"))
    )
    total = pv.agg(F.sum("value_c").alias("total_c"))
    return (
        pv.join(F.broadcast(total))
        .filter(F.col("value_c") * 1000 > F.col("total_c"))
        .select("ps_partkey", (F.col("value_c") / 100.0).alias("value"))
        .orderBy(F.desc("value"), F.asc("ps_partkey"))
    )


# -------------------------------------------------------------- Q-TPCH13
@query(
    "q_h13",
    oracle="""
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
          FROM customer c
          LEFT JOIN orders o ON c.c_custkey = o.o_custkey
               AND o.o_orderpriority <> '1-URGENT'
          GROUP BY c.c_custkey) co
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q_h13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 customer order-count distribution: left outer join
    with the filter INSIDE the join condition (customers whose only
    orders are urgent still count as zero), then a two-level
    aggregate. COUNT(o_orderkey) counts non-null matches only —
    identical null semantics on both engines."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(
            o,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# -------------------------------------------------------------- Q-TPCH15
@query(
    "q_h15",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no, SUM({_CENTS_REV}) AS total_c
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY supplier_no)
    SELECT s.s_suppkey, s.s_name, r.total_c / 100.0 AS total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_c = (SELECT MAX(total_c) FROM revenue)
    ORDER BY s.s_suppkey
    """,
)
def q_h15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 top supplier: quarterly revenue per supplier, keep
    the max. The MAX scalar subquery is a broadcast single-row
    aggregate; the equality compares exact integer cents (comparing
    the /100.0 doubles would work here but the int compare is the
    disciplined form)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    s = load_table(spark, sf_dir, "supplier")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_rev_cents()).alias("total_c")
    )
    mx = revenue.agg(F.max("total_c").alias("max_c"))
    return (
        s.join(revenue, F.col("s_suppkey") == F.col("supplier_no"))
        .join(F.broadcast(mx))
        .filter(F.col("total_c") == F.col("max_c"))
        .select(
            "s_suppkey", "s_name", (F.col("total_c") / 100.0).alias("total_revenue")
        )
        .orderBy("s_suppkey")
    )


# -------------------------------------------------------------- Q-TPCH16
@query(
    "q_h16",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM part p JOIN lineitem l ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
      AND l.l_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    """,
)
def q_h16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 part/supplier relationship counts (lineitem as the
    partsupp stand-in; negative account balance as the 'complaints'
    exclusion). The NOT IN is an anti join against a tiny broadcast
    exclusion list (s_suppkey is never null, so anti join and NOT IN
    agree); COUNT(DISTINCT) shuffles once on the 3-part group key."""
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
    )
    li = load_table(spark, sf_dir, "lineitem")
    bad = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select(F.col("s_suppkey").alias("l_suppkey"))
    return (
        li.join(F.broadcast(bad), "l_suppkey", "left_anti")
        .join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


# -------------------------------------------------------------- Q-TPCH17
@query(
    "q_h17",
    oracle="""
    WITH pq AS (
      SELECT l_partkey,
             SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS sum_qc,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM lineitem GROUP BY l_partkey)
    SELECT SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) / 100.0 / 7.0
             AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN pq ON pq.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#2' AND p.p_size <= 10
      AND CAST(ROUND(l.l_quantity * 100) AS BIGINT) * 5 * pq.cnt < pq.sum_qc
    """,
)
def q_h17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 small-quantity-order revenue: lineitems below 20% of
    their part's average quantity. The correlated AVG becomes a
    per-part (sum, count) aggregate joined back; the 0.2*avg threshold
    is integer cross-multiplication over quantity cents (qty*5*cnt <
    sum), so no engine ever divides."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#2") & (F.col("p_size") <= 10)
    )
    qc = F.round(F.col("l_quantity") * 100).cast("bigint")
    pq = li.groupBy(F.col("l_partkey").alias("pq_partkey")).agg(
        F.sum(qc).alias("sum_qc"), F.count("*").alias("cnt")
    )
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(pq, F.col("pq_partkey") == F.col("l_partkey"))
        .filter(qc * 5 * F.col("cnt") < F.col("sum_qc"))
        .agg(
            (
                F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint"))
                / 100.0
                / 7.0
            ).alias("avg_yearly")
        )
    )


# -------------------------------------------------------------- Q-TPCH18
@query(
    "q_h18",
    oracle="""
    WITH big AS (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) > 30000)
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
           o.o_totalprice,
           SUM(CAST(ROUND(l.l_quantity * 100) AS BIGINT)) / 100.0 AS sum_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (SELECT l_orderkey FROM big)
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
             o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 100
    """,
)
def q_h18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 large-volume customers: orders totalling >300 units.
    The IN-subquery is a semi join against the HAVING aggregate
    (threshold in integer quantity-cents); only qualifying orders
    reach the customer join."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    qc = F.round(F.col("l_quantity") * 100).cast("bigint")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(qc).alias("sum_qc"))
        .filter(F.col("sum_qc") > 30000)
        .select("l_orderkey")
    )
    return (
        o.join(big.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey", "left_semi")
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg((F.sum(qc) / 100.0).alias("sum_qty"))
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


# -------------------------------------------------------------- Q-TPCH19
@query(
    "q_h19",
    oracle=f"""
    SELECT SUM({_CENTS_REV}) / 100.0 AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 5 AND 20
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def q_h19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 discounted revenue under OR'd predicate triplets
    (brand/size/quantity standing in for the missing container and
    shipmode columns). The disjunction spans both join sides, so it
    evaluates post-join; the broadcast keeps lineitem unshuffled."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")

    def triplet(brand: str, s_lo: int, s_hi: int, q_lo: int, q_hi: int) -> F.Column:
        return (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(s_lo, s_hi)
            & F.col("l_quantity").between(q_lo, q_hi)
        )

    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .filter(
            triplet("Brand#1", 1, 10, 1, 11)
            | triplet("Brand#2", 5, 20, 10, 20)
            | triplet("Brand#3", 10, 30, 20, 30)
        )
        .agg((F.sum(_rev_cents()) / 100.0).alias("revenue"))
    )


# -------------------------------------------------------------- Q-TPCH20
@query(
    "q_h20",
    oracle="""
    SELECT s.s_name, s.s_suppkey
    FROM supplier s
    WHERE s.s_suppkey IN (
      SELECT l.l_suppkey
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_name LIKE 'small%'
        AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l.l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY l.l_suppkey, l.l_partkey
      HAVING SUM(CAST(ROUND(l.l_quantity * 100) AS BIGINT)) > 5000)
    ORDER BY s.s_suppkey
    """,
)
def q_h20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 potential part promotion: suppliers who moved >50
    units of some 'small%' part in 1996 (the dataset's analog of
    availqty > half the shipped quantity). Nested IN-subqueries
    flatten to aggregate -> semi join."""
    s = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    qc = F.round(F.col("l_quantity") * 100).cast("bigint")
    movers = (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(qc).alias("sum_qc"))
        .filter(F.col("sum_qc") > 5000)
        .select(F.col("l_suppkey").alias("s_suppkey"))
    )
    return (
        s.join(movers, "s_suppkey", "left_semi")
        .select("s_name", "s_suppkey")
        .orderBy("s_suppkey")
    )


# -------------------------------------------------------------- Q-TPCH21
@query(
    "q_h21",
    oracle="""
    SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3 JOIN orders o3
                        ON o3.o_orderkey = l3.l_orderkey
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 10
    """,
)
def q_h21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 suppliers who kept orders waiting: the sole late
    supplier (shipped >60 days after the order date) on a multi-
    supplier finished order. EXISTS/NOT EXISTS become a semi and an
    anti join on (orderkey, suppkey-inequality) — three passes over
    lineitem, each a co-partitioned shuffle on l_orderkey, which AQE
    plans as one exchange reused."""
    s = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    l1 = (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(late)
        .select("l_orderkey", "l_suppkey")
    )
    # other-supplier lineitems of the same order (any, and late-only)
    l2 = li.select(
        F.col("l_orderkey").alias("o2_orderkey"), F.col("l_suppkey").alias("o2_suppkey")
    )
    l3 = l1.select(
        F.col("l_orderkey").alias("o3_orderkey"), F.col("l_suppkey").alias("o3_suppkey")
    )
    waiting = (
        l1.join(
            l2,
            (F.col("o2_orderkey") == F.col("l_orderkey"))
            & (F.col("o2_suppkey") != F.col("l_suppkey")),
            "left_semi",
        ).join(
            l3,
            (F.col("o3_orderkey") == F.col("l_orderkey"))
            & (F.col("o3_suppkey") != F.col("l_suppkey")),
            "left_anti",
        )
    )
    return (
        waiting.join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(10)
    )


# -------------------------------------------------------------- Q-TPCH22
@query(
    "q_h22",
    oracle="""
    WITH pos AS (
      SELECT SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS sum_c,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM customer WHERE c_acctbal > 0)
    SELECT c.c_nationkey % 5 AS cntrycode,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           SUM(CAST(ROUND(c.c_acctbal * 100) AS BIGINT)) / 100.0
             AS totacctbal
    FROM customer c, pos
    WHERE c.c_nationkey % 5 IN (0, 1, 2, 3)
      AND CAST(ROUND(c.c_acctbal * 100) AS BIGINT) * pos.cnt > pos.sum_c
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
    GROUP BY cntrycode
    ORDER BY cntrycode
    """,
)
def q_h22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 global sales opportunity: customers with no recent
    orders (none since 1999 — every customer in this dataset has SOME
    order) whose balance beats the average positive balance, bucketed
    by 'country code' (nationkey mod 5 — the dataset has no phone
    column). The AVG threshold is the (sum, count) broadcast with an
    integer cross-multiplied compare; NOT EXISTS is an anti join on
    o_custkey."""
    c = load_table(spark, sf_dir, "customer")
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1999-01-01 00:00:00").cast("timestamp"))
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    bc = F.round(F.col("c_acctbal") * 100).cast("bigint")
    pos = c.filter(F.col("c_acctbal") > 0).agg(
        F.sum(bc).alias("sum_c"), F.count("*").alias("cnt")
    )
    code = (F.col("c_nationkey") % 5).alias("cntrycode")
    return (
        c.filter((F.col("c_nationkey") % 5).isin(0, 1, 2, 3))
        .join(o, "c_custkey", "left_anti")
        .join(F.broadcast(pos))
        .filter(bc * F.col("cnt") > F.col("sum_c"))
        .groupBy(code)
        .agg(
            F.count("*").alias("numcust"),
            (F.sum(bc) / 100.0).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )
